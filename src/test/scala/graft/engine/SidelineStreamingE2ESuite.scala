package graft.engine

import graft.SparkSuite
import graft.filter.FilterSpec
import graft.model.{ConsumerPartition, ConsumerState}
import graft.sideline.SidelineRequest
import graft.sources.LogSource
import graft.streaming.StreamingFirehose
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import scala.collection.mutable

/**
 * The reference's flagship E2E scenario on live streams
 * (SidelineSpoutTest.java: start/resume/resolve while spouts are active):
 *
 *   1. a streaming firehose is processing a file-backed log;
 *   2. mid-stream, tenant '2' is sidelined (START) — subsequent batches
 *      drop it;
 *   3. RESUME launches a SECOND concurrent query under the coordinator
 *      replaying ONLY the dropped rows from the start snapshot;
 *   4. RESOLVE bounds the window; the replay drains it;
 *   5. invariant: firehose-emitted ∪ sideline-replayed ≡ every row after
 *      the start snapshot (within the resolved window), disjoint.
 */
class SidelineStreamingE2ESuite extends SparkSuite {

  private final class DirLog(dir: String, schema: String) extends LogSource {
    val namespace = "file"
    def read(spark: SparkSession): DataFrame =
      spark.read.schema(schema).parquet(s"$dir/d*")
    override def currentState(spark: SparkSession): ConsumerState = {
      val rows = read(spark).groupBy(col("partition"))
        .agg(max(col("offset")).as("m")).collect()
      ConsumerState(rows.map(r =>
        ConsumerPartition(namespace, r.getInt(0)) -> r.getLong(1)).toMap)
    }
  }

  test("sideline lifecycle on a live stream with a concurrent replay query") {
    val sparkS = spark
    import sparkS.implicits._
    val inDir = Files.createTempDirectory("graft-e2e-in").toString
    val cpDir = Files.createTempDirectory("graft-e2e-cp").toString
    val schema = "partition INT, offset LONG, key STRING, value STRING"

    def writeChunk(part: Int, offsets: Range): Unit =
      offsets.map(o => (part, o.toLong, s"${o % 5}", s"v$o"))
        .toDF("partition", "offset", "key", "value")
        .write.mode("append").parquet(s"$inDir/d$part")

    // initial log content: 2 partitions x offsets 0..59
    writeChunk(0, 0 until 60)
    writeChunk(1, 0 until 60)

    val log = new DirLog(inDir, schema)
    val engine = SidelineEngine.inMemory(log)
    val coord = new QueryCoordinator(spark)

    val emitted = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val stream = spark.readStream.schema(schema).parquet(s"$inDir/d*")
    val fh = coord.launch("firehose", pool = "firehose") {
      StreamingFirehose.run(stream, engine,
        mainSink = (df, _) => emitted.synchronized {
          emitted ++= df.select("partition", "offset", "key")
            .as[(Int, Long, String)].collect()
        },
        checkpointLocation = Some(cpDir),
        trigger = Trigger.ProcessingTime(100), queryName = "firehose")
    }
    try {
      fh.processAllAvailable()
      val beforeStart = emitted.size
      assert(beforeStart === 120)

      // START: sideline tenant '2' — snapshot = current max offsets (59)
      engine.start(SidelineRequest("t2", FilterSpec.KeyIn("key", Seq("2"))), spark)

      // more data arrives while the sideline is active
      writeChunk(0, 60 until 120)
      writeChunk(1, 60 until 120)
      fh.processAllAvailable()

      val afterStart = emitted.toSeq.drop(beforeStart)
      assert(afterStart.nonEmpty && !afterStart.exists(_._3 == "2"),
        "firehose must drop the sidelined tenant after START")

      // RESUME: concurrent bounded-from-snapshot replay query (batch job
      // under the coordinator's scheduler pool — a bounded replay is a
      // batch read in this engine)
      engine.resume("t2")
      // RESOLVE while "active": stamp ending offsets at current log end
      engine.resolve("t2", spark)
      val replay = engine.sidelineReplay("t2", spark)
        .select("partition", "offset", "key")
        .as[(Int, Long, String)].collect().toSeq
      assert(replay.nonEmpty && replay.forall(_._3 == "2"))

      // parity invariant over the sideline window (start..end]
      val p0 = engine.store.retrieve("t2").get
      val window = log.readBounded(spark, p0.startingState, p0.endingState)
        .select("partition", "offset", "key").as[(Int, Long, String)]
        .collect().toSet
      val fhInWindow = afterStart.toSet.filter(r => window.contains(r))
      assert((fhInWindow ++ replay.toSet) === window)
      assert(fhInWindow.intersect(replay.toSet).isEmpty)

      // completion cleanup; firehose stops dropping on the NEXT batch
      engine.complete("t2")
      writeChunk(0, 120 until 140)
      fh.processAllAvailable()
      val afterComplete = emitted.toSeq.drop(beforeStart + afterStart.size)
      assert(afterComplete.exists(_._3 == "2"),
        "after RESOLVE+complete the firehose must emit the tenant again")
    } finally {
      coord.close(5000)
    }
  }

  test("RESOLVE against a LIVE firehose: ending from committed progress, no quiesce, parity holds") {
    // Mirror of reference SidelineSpoutTest
    // testResumingSpoutWhileSidelinedVirtualSpoutIsActive (r2 verdict #2):
    // the firehose keeps ingesting across START→RESUME→RESOLVE — no
    // processAllAvailable barrier around RESOLVE — and the ending is
    // stamped from the firehose's own committed batch progress via
    // FirehoseHandle.resolveAtCommitted, which linearizes against the
    // chain-read→process→commit batch loop.
    val sparkS = spark
    import sparkS.implicits._
    val inDir = Files.createTempDirectory("graft-live-in").toString
    val cpDir = Files.createTempDirectory("graft-live-cp").toString
    val schema = "partition INT, offset LONG, key STRING, value STRING"

    val nextOffset = mutable.Map(0 -> 0L, 1 -> 0L)
    def writeChunk(rows: Int): Unit = for (part <- Seq(0, 1)) {
      val from = nextOffset(part)
      (from until from + rows)
        .map(o => (part, o, s"${o % 5}", s"v$o"))
        .toDF("partition", "offset", "key", "value")
        .write.mode("append").parquet(s"$inDir/d$part")
      nextOffset(part) = from + rows
    }
    writeChunk(40)

    val log = new DirLog(inDir, schema)
    val engine = SidelineEngine.inMemory(log)
    val coord = new QueryCoordinator(spark)
    val handle = new graft.streaming.StreamingFirehose.FirehoseHandle

    val emitted = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val stream = spark.readStream.schema(schema).parquet(s"$inDir/d*")
    val fh = coord.launch("firehose", pool = "firehose") {
      StreamingFirehose.run(stream, engine,
        mainSink = (df, _) => emitted.synchronized {
          emitted ++= df.select("partition", "offset", "key")
            .as[(Int, Long, String)].collect()
        },
        checkpointLocation = Some(cpDir),
        trigger = Trigger.ProcessingTime(50), queryName = "firehose-live",
        handle = Some(handle))
    }
    try {
      fh.processAllAvailable()
      val beforeStart = emitted.size
      engine.start(SidelineRequest("t2", FilterSpec.KeyIn("key", Seq("2"))), spark)
      val starting = engine.store.retrieve("t2").get.startingState

      // a writer keeps feeding the stream through RESUME and RESOLVE —
      // the firehose is processing new batches the whole time
      @volatile var writerDone = false
      val writer = new Thread(() => {
        for (_ <- 1 to 40) { writeChunk(10); Thread.sleep(100) }
        writerDone = true
      }, "live-writer")
      writer.start()

      // wait (poll, not quiesce — the trigger loop keeps running) until
      // at least one batch of post-START data committed WITH the filter
      // active, so the resolved window is non-trivial
      def committedBeyondStart(): Boolean =
        starting.offsets.exists { case (cp, s) =>
          handle.committedState.get(cp).exists(_ > s) }
      val deadline = System.nanoTime() + 30_000_000_000L
      while (!committedBeyondStart() && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(committedBeyondStart(), "no filtered batch committed in 30s")
      engine.resume("t2")
      // RESOLVE while batches are in flight: NO quiesce, ending comes
      // from the handle's committed progress under the batch-loop lock
      val resolved = handle.resolveAtCommitted(engine, "t2")
      val ending = resolved.endingState.get
      assert(!writerDone, "writer finished early — RESOLVE was not live; slow the test down")

      writer.join()
      fh.processAllAvailable()

      // committed-progress ending is a real snapshot: at/above starting,
      // strictly below the final log end (data kept arriving after it)
      for ((cp, s) <- starting.offsets)
        assert(ending.offsets(cp) >= s)
      val finalEnd = log.currentState(spark)
      assert(ending.offsets.exists { case (cp, e) => e < finalEnd.offsets(cp) },
        s"ending $ending not below final $finalEnd — stream was not live across RESOLVE")

      val replay = engine.sidelineReplay("t2", spark)
        .select("partition", "offset", "key").as[(Int, Long, String)]
        .collect().toSet
      val afterStart = emitted.synchronized(emitted.toSeq.drop(beforeStart)).toSet

      // every replayed row is tenant-2 inside (starting, ending]
      assert(replay.nonEmpty && replay.forall(_._3 == "2"))
      assert(replay.forall { case (p, o, _) =>
        o <= ending.offsets(ConsumerPartition("file", p)) &&
          o > starting.offsets(ConsumerPartition("file", p)) })

      // THE invariant (reference: firehose ∪ sideline ≡ input, disjoint):
      // every tenant-2 row written after the start snapshot surfaces
      // EXACTLY once — in the replay iff ≤ ending (batches that saw the
      // filter), on the firehose iff > ending (batches after RESOLVE)
      val tenantWritten = (0 until 2).flatMap { p =>
        val s = starting.offsets(ConsumerPartition("file", p))
        (s + 1 until nextOffset(p)).filter(_ % 5 == 2).map(o => (p, o.toLong, "2"))
      }.toSet
      val fhTenant = afterStart.filter(_._3 == "2")
      assert(fhTenant.forall { case (p, o, _) =>
        o > ending.offsets(ConsumerPartition("file", p)) },
        "firehose emitted a tenant row inside the resolved window — double emit")
      assert(fhTenant.intersect(replay).isEmpty)
      assert(replay ++ fhTenant === tenantWritten,
        "a sidelined row was lost or duplicated across the live RESOLVE")

      // and the non-tenant flow was never interrupted
      val nonTenantWritten = (0 until 2).flatMap { p =>
        val s = starting.offsets(ConsumerPartition("file", p))
        (s + 1 until nextOffset(p)).filter(_ % 5 != 2)
          .map(o => (p, o.toLong, s"${o % 5}"))
      }.toSet
      assert(afterStart.filter(_._3 != "2") === nonTenantWritten)
    } finally {
      coord.close(5000)
    }
  }
}
