package graft.engine

import graft.SparkSuite
import graft.filter.FilterSpec
import graft.model.ConsumerPartition
import graft.sideline.SidelineRequest
import graft.sources.{GraftLog, GraftLogInputPartition, GraftLogSource}
import graft.streaming.StreamingFirehose
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import scala.collection.mutable

/**
 * The sideline lifecycle driven over the NATIVE V2 log connector — the
 * reference's flagship scenario (SidelineSpoutTest.java:237 resume
 * while active; ConsumerTest.java:1856-2430 resume matrix) composed
 * with the engine's own log: START snapshots positions from parquet
 * FOOTER stats, the firehose consumes the connector's MicroBatchStream
 * (owned offsets), and the RESUME replay rides the batch scan's
 * startingOffsets/endingOffsets — planned, not filtered: the window
 * bounds prune files before any task runs.
 */
class GraftLogSidelineE2ESuite extends SparkSuite {

  test("START→RESUME→RESOLVE over graftlog: planned replay window, firehose ∪ sideline ≡ log") {
    val sparkS = spark
    import sparkS.implicits._
    val logDir = Files.createTempDirectory("graftlog-sideline").toString
    val cpDir = Files.createTempDirectory("graftlog-sideline-cp").toString

    def writeChunk(offsets: Range): Unit =
      (for (p <- 0 until 2; o <- offsets)
        yield (p, o.toLong, s"${o % 5}", s"v$p-$o"))
        .toDF("partition", "offset", "key", "value")
        .repartition(col("partition")) // one segment file per partition per chunk
        .write.mode("append").partitionBy("partition").parquet(logDir)

    writeChunk(0 until 60)

    val log = GraftLogSource(logDir)
    val engine = SidelineEngine.inMemory(log)
    val coord = new QueryCoordinator(spark)

    val emitted = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val stream = log.readStreamFrom(spark)
    val fh = coord.launch("firehose", pool = "firehose") {
      StreamingFirehose.run(stream, engine,
        mainSink = (df, _) => emitted.synchronized {
          emitted ++= df.select("partition", "offset", "key")
            .as[(Int, Long, String)].collect()
        },
        checkpointLocation = Some(cpDir),
        trigger = Trigger.ProcessingTime(100), queryName = "graftlog-firehose")
    }
    try {
      fh.processAllAvailable()
      val beforeStart = emitted.size
      assert(beforeStart === 120)

      // START: the snapshot comes from footer statistics (currentState
      // override) — positions, never a data scan
      engine.start(SidelineRequest("t2", FilterSpec.KeyIn("key", Seq("2"))), spark)
      val starting = engine.store.retrieve("t2").get.startingState
      assert(starting.offsets === Map(
        ConsumerPartition("graftlog", 0) -> 59L,
        ConsumerPartition("graftlog", 1) -> 59L))

      // the log grows while the sideline is active
      writeChunk(60 until 120)
      fh.processAllAvailable()
      val afterStart = emitted.toSeq.drop(beforeStart)
      assert(afterStart.nonEmpty && !afterStart.exists(_._3 == "2"),
        "firehose must drop the sidelined tenant after START")

      engine.resume("t2")
      engine.resolve("t2", spark)
      val p0 = engine.store.retrieve("t2").get
      val ending = p0.endingState.get
      assert(ending.offsets.values.toSet === Set(119L))

      // the replay WINDOW is planned, not filtered: every task carries
      // [watermark+1, ending+1) and pre-START files are pruned away
      val replayDf = engine.sidelineReplay("t2", spark)
      val scan = flattenPlan(replayDf.queryExecution.executedPlan).collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.getOrElse(fail("replay did not plan a V2 batch scan"))
      val parts = scan.inputPartitions.collect { case g: GraftLogInputPartition => g }
      assert(parts.nonEmpty)
      parts.foreach { g =>
        assert(g.from === 60L && g.until === 120L, s"window not planned: $g")
        // file-level pruning: the pre-START segment (offsets 0..59) of
        // each partition never ships to a task
        assert(g.files.length === 1, s"pre-START files not pruned: ${g.files.toSeq}")
      }

      val replay = replayDf.select("partition", "offset", "key")
        .as[(Int, Long, String)].collect().toSet
      assert(replay.nonEmpty && replay.forall(_._3 == "2"))

      // native readBounded parity with the trait semantics: exactly the
      // rows with starting < offset <= ending, per partition
      val window = log.readBounded(spark, p0.startingState, p0.endingState)
        .select("partition", "offset", "key").as[(Int, Long, String)]
        .collect().toSet
      val expectedWindow = (for (p <- 0 until 2; o <- 60 until 120)
        yield (p, o.toLong, s"${o % 5}")).toSet
      assert(window === expectedWindow, "native bounded read broke the window contract")

      // THE invariant: firehose ∪ sideline ≡ the window, disjoint
      val fhInWindow = afterStart.toSet.filter(window.contains)
      assert((fhInWindow ++ replay) === window)
      assert(fhInWindow.intersect(replay).isEmpty)

      // completion: the firehose emits the tenant again on later batches
      engine.complete("t2")
      writeChunk(120 until 140)
      fh.processAllAvailable()
      val afterComplete = emitted.toSeq.drop(beforeStart + afterStart.size)
      assert(afterComplete.exists(_._3 == "2"),
        "after RESOLVE+complete the firehose must emit the tenant again")
    } finally {
      coord.close(5000)
    }
  }
}
