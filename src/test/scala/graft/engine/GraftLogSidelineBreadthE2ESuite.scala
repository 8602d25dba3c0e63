package graft.engine

import graft.SparkSuite
import graft.filter.FilterSpec
import graft.sideline.SidelineRequest
import graft.sources.GraftLogSource
import graft.streaming.StreamingFirehose
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import scala.collection.mutable

/**
 * OVERLAPPING sideline lifecycles over the NATIVE V2 log connector —
 * the reference's resume-while-active matrix
 * (SidelineSpoutTest.java:237, ConsumerTest.java:1856-2430) taken
 * breadth-first AND depth-first at once: three sidelines START at
 * different log positions, coexist, and RESOLVE at different positions
 * while the others stay active, the firehose consuming and the chain
 * mutating between micro-batches the whole time.
 *
 * The invariant web this pins:
 *  - per sideline: replay ≡ EXACTLY its tenant's rows in its own
 *    (start, end] window — unaffected by the other chains' edits;
 *  - globally, at the end: firehose ∪ replay₁ ∪ replay₂ ∪ replay₃ ≡
 *    every row of the log, PAIRWISE disjoint — no row lost at any
 *    chain transition, none double-delivered (the reference's
 *    at-least-once upgraded to the exactly-once the sink provides);
 *  - after each RESOLVE+complete, the freed tenant flows on the
 *    firehose again while the remaining sidelines keep filtering.
 */
class GraftLogSidelineBreadthE2ESuite extends SparkSuite {

  test("3 overlapping START/RESOLVE lifecycles over graftlog keep every parity") {
    val sparkS = spark
    import sparkS.implicits._
    val logDir = Files.createTempDirectory("graftlog-overlap").toString
    val cpDir = Files.createTempDirectory("graftlog-overlap-cp").toString

    def writeChunk(offsets: Range): Unit =
      (for (p <- 0 until 2; o <- offsets)
        yield (p, o.toLong, s"${o % 7}", s"v$p-$o"))
        .toDF("partition", "offset", "key", "value")
        .repartition(col("partition"))
        .write.mode("append").partitionBy("partition").parquet(logDir)

    val log = GraftLogSource(logDir)
    val engine = SidelineEngine.inMemory(log)
    val coord = new QueryCoordinator(spark)
    val emitted = mutable.ArrayBuffer.empty[(Int, Long, String)]
    writeChunk(0 until 40)
    val fh = coord.launch("firehose", pool = "firehose") {
      StreamingFirehose.run(log.readStreamFrom(spark), engine,
        mainSink = (df, _) => emitted.synchronized {
          emitted ++= df.select("partition", "offset", "key")
            .as[(Int, Long, String)].collect()
        },
        checkpointLocation = Some(cpDir),
        trigger = Trigger.ProcessingTime(50), queryName = "graftlog-overlap")
    }

    def emittedSet = emitted.synchronized(emitted.toSet)
    def tenantOf(o: Long) = s"${o % 7}"

    try {
      fh.processAllAvailable()
      assert(emitted.size === 80)

      // START t1; t2 and t3 join at LATER positions — three chains alive
      val tenants = Map("t1" -> "1", "t2" -> "2", "t3" -> "3")
      engine.start(SidelineRequest("t1", FilterSpec.KeyIn("key", Seq("1"))), spark)
      writeChunk(40 until 80)
      fh.processAllAvailable()
      assert(!emittedSet.exists(r => r._2 >= 40 && r._3 == "1"),
        "t1's tenant leaked after START")

      engine.start(SidelineRequest("t2", FilterSpec.KeyIn("key", Seq("2"))), spark)
      writeChunk(80 until 120)
      fh.processAllAvailable()
      assert(!emittedSet.exists(r => r._2 >= 80 && Set("1", "2")(r._3)),
        "a sidelined tenant leaked while two chains were active")

      engine.start(SidelineRequest("t3", FilterSpec.KeyIn("key", Seq("3"))), spark)
      writeChunk(120 until 160)
      fh.processAllAvailable()
      assert(!emittedSet.exists(r => r._2 >= 120 && Set("1", "2", "3")(r._3)),
        "a sidelined tenant leaked while three chains were active")

      // RESOLVE in arrival order, each while the LATER ones stay active;
      // grow the log between resolves so every window end differs
      val replays = mutable.Map.empty[String, Set[(Int, Long, String)]]
      def resolveAndCheck(id: String, nextChunk: Option[Range]): Unit = {
        fh.processAllAvailable()
        engine.resume(id)
        engine.resolve(id, spark)
        val payload = engine.store.retrieve(id).get
        val replay = engine.sidelineReplay(id, spark)
          .select("partition", "offset", "key").as[(Int, Long, String)]
          .collect().toSet
        // per-sideline parity: exactly this tenant's rows in THIS window
        val window = log.readBounded(spark, payload.startingState, payload.endingState)
          .select("partition", "offset", "key").as[(Int, Long, String)]
          .collect().toSet
        assert(replay === window.filter(_._3 == tenants(id)),
          s"$id replay is not exactly its tenant's window rows")
        assert(replay.nonEmpty, s"$id replayed nothing")
        assert(emittedSet.intersect(replay).isEmpty,
          s"$id: a replayed row was also on the firehose")
        replays(id) = replay
        engine.complete(id)
        nextChunk.foreach { r => writeChunk(r); fh.processAllAvailable() }
      }

      resolveAndCheck("t1", Some(160 until 200))
      // t1's tenant flows again while t2/t3 still filter
      assert(emittedSet.exists(r => r._2 >= 160 && r._3 == "1"),
        "completed tenant 1 did not rejoin the firehose")
      assert(!emittedSet.exists(r => r._2 >= 160 && Set("2", "3")(r._3)),
        "remaining chains stopped filtering after t1 completed")

      resolveAndCheck("t2", Some(200 until 240))
      assert(emittedSet.exists(r => r._2 >= 200 && r._3 == "2"),
        "completed tenant 2 did not rejoin the firehose")
      assert(!emittedSet.exists(r => r._2 >= 200 && r._3 == "3"),
        "t3 stopped filtering after t2 completed")

      resolveAndCheck("t3", None)
      fh.processAllAvailable()

      // the global web: firehose ∪ replays ≡ the whole log, disjoint
      val all = (for (p <- 0 until 2; o <- 0 until 240)
        yield (p, o.toLong, tenantOf(o.toLong))).toSet
      val parts = Seq(emittedSet, replays("t1"), replays("t2"), replays("t3"))
      assert(parts.map(_.size).sum === all.size,
        s"double delivery or loss: ${parts.map(_.size)} vs ${all.size}")
      assert(parts.reduce(_ ++ _) === all,
        "firehose ∪ replays is not the whole log")
    } finally {
      coord.close(5000)
    }
  }
}
