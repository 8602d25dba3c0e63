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
 * Sideline BREADTH under load (r3 item #7): 50 concurrent sidelines — 49
 * scalar tenant steps plus one table-backed [[FilterSpec.KeyInTable]]
 * skip-list — against a live firehose.
 *
 * What must hold at this width (and, by the same mechanism, at 100 TB):
 *  - the chain compiles to ONE Catalyst conjunction per batch for the
 *    scalar steps plus one broadcast anti join for the table step, so
 *    batch time grows SUB-LINEARLY in the number of sidelines (the
 *    reference pays a live per-record, per-step filter loop —
 *    dynamic/filter/FilterChain.java:37-137);
 *  - every sidelined tenant vanishes from the firehose within a batch;
 *  - parity per sideline survives the crowd: for sampled requests
 *    (2 scalar + the join-backed one), replay ≡ exactly that tenant's
 *    rows in the resolved window, disjoint from firehose emissions.
 */
class SidelineBreadthE2ESuite extends SparkSuite {

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

  test("50 concurrent sidelines: sub-linear batch cost, per-tenant parity intact") {
    val sparkS = spark
    import sparkS.implicits._
    val inDir = Files.createTempDirectory("graft-breadth-in").toString
    val cpDir = Files.createTempDirectory("graft-breadth-cp").toString
    val skipDir = Files.createTempDirectory("graft-breadth-skip").toString + "/keys"
    val schema = "partition INT, offset LONG, key STRING, value STRING"

    val nextOffset = mutable.Map(0 -> 0L, 1 -> 0L)
    def writeChunk(rows: Int): Unit = for (part <- Seq(0, 1)) {
      val from = nextOffset(part)
      (from until from + rows)
        .map(o => (part, o, s"${o % 100}", s"v$o")) // 100 tenants
        .toDF("partition", "offset", "key", "value")
        .write.mode("append").parquet(s"$inDir/d$part")
      nextOffset(part) = from + rows
    }
    writeChunk(200)

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
        trigger = Trigger.ProcessingTime(50), queryName = "firehose-breadth")
    }

    def nonEmptyBatches(): Map[Long, Long] =
      fh.recentProgress.filter(_.numInputRows > 0)
        .map(p => p.batchId -> p.durationMs.get("triggerExecution").longValue())
        .toMap

    try {
      // ---- phase 1: empty chain baseline over 4 data waves
      for (_ <- 1 to 4) { writeChunk(200); fh.processAllAvailable() }
      val baseBatches = nonEmptyBatches()
      val baselineAvg = baseBatches.values.sum.toDouble / baseBatches.size

      // ---- 50 sidelines: tenants 0..48 scalar + {60,61,62} via skip-list
      graft.ops.SkipList.write(spark, skipDir, Seq("60", "61", "62"))
      val scalarIds = (0 until 49).map { t =>
        val id = f"t$t%02d"
        engine.start(SidelineRequest(id,
          FilterSpec.KeyIn("key", Seq(t.toString))), spark)
        id
      }
      val tableId = "t49"
      engine.start(SidelineRequest(tableId,
        FilterSpec.KeyInTable("key", skipDir)), spark)
      val starting = engine.store.retrieve(tableId).get.startingState

      // ---- phase 2: same wave pattern under the 50-step chain
      for (_ <- 1 to 4) { writeChunk(200); fh.processAllAvailable() }
      val loadedBatches = nonEmptyBatches() -- baseBatches.keys
      val loadedAvg = loadedBatches.values.sum.toDouble / loadedBatches.size

      // every sidelined tenant is gone from the firehose; others flow
      val sidelinedTenants =
        (0 until 49).map(_.toString).toSet ++ Set("60", "61", "62")
      val afterStart = emitted.synchronized(emitted.toSeq)
        .filter { case (p, o, _) =>
          o > starting.offsets(ConsumerPartition("file", p)) }
      assert(afterStart.nonEmpty)
      assert(!afterStart.exists(r => sidelinedTenants.contains(r._3)),
        "a sidelined tenant leaked onto the firehose under 50-wide load")
      assert(afterStart.exists(r => !sidelinedTenants.contains(r._3)))

      // sub-linear growth: 50 steps must cost far less than 50 × baseline
      val ratio = loadedAvg / baselineAvg
      info(f"batch avg: baseline $baselineAvg%.1f ms (${baseBatches.size} batches), " +
        f"50 sidelines $loadedAvg%.1f ms (${loadedBatches.size} batches), ratio $ratio%.2f×")
      assert(ratio < 10.0,
        f"50 sidelines cost $ratio%.2f× baseline — super-linear chain application")

      // ---- parity for 3 sampled sidelines (2 scalar + the join-backed)
      fh.processAllAvailable() // quiesce so log-end RESOLVE is batch-aligned
      val sampled = Seq("t07" -> Set("7"), "t23" -> Set("23"),
        tableId -> Set("60", "61", "62"))
      for ((id, tenants) <- sampled) {
        engine.resume(id)
        engine.resolve(id, spark)
        val p = engine.store.retrieve(id).get
        val replay = engine.sidelineReplay(id, spark)
          .select("partition", "offset", "key").as[(Int, Long, String)]
          .collect().toSet
        val window = log.readBounded(spark, p.startingState, p.endingState)
          .select("partition", "offset", "key").as[(Int, Long, String)]
          .collect().toSet
        val tenantWindow = window.filter(r => tenants.contains(r._3))
        assert(replay === tenantWindow,
          s"$id: replay must be exactly the tenant rows in the window")
        val fhSet = emitted.synchronized(emitted.toSet)
        assert(fhSet.intersect(replay).isEmpty,
          s"$id: a replayed row was also emitted by the firehose")
      }
    } finally {
      coord.close(5000)
    }
  }
}
