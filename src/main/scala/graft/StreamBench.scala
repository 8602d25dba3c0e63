package graft

import graft.engine.SidelineEngine
import graft.filter.FilterSpec
import graft.model.ConsumerState
import graft.sideline.{SidelinePayload, SidelineType}
import graft.sources.LogSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, md5}
import org.apache.spark.sql.streaming.Trigger

import java.util.concurrent.atomic.LongAdder

/**
 * Streaming-throughput benchmark (supplementary to [[Bench]]): drives the
 * FULL firehose path — file-stream source → per-batch chain re-read →
 * compiled drop predicate → routed sinks + metrics groupBy — over the
 * events table split into many files, with one active sideline step, and
 * reports end-to-end rows/second. The reference publishes no numbers
 * (BASELINE.md §1), so this is the engine's own single-node stream
 * throughput record at the given SF.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.StreamBench
 */
object StreamBench {

  final case class Result(rowsPerSec: Double, rows: Long, emitted: Long,
      filtered: Long, batches: Long, seconds: Double)

  /** Drive the full firehose path over a staged many-file stream and
    * measure end-to-end rows/second. Reused by [[MetricsReport]]. */
  def run(spark: SparkSession, sfDir: String): Result = {
    // stage the events table ×10 as a many-file stream input (each file
    // is an admission unit; 48 files + maxFilesPerTrigger=12 → 4
    // micro-batches of ~250k rows at sf0.1 — small batches only measure
    // the fixed per-trigger overhead, not per-row throughput)
    val stage = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    val ev = Tables.events(spark, sfDir)
    (1 to 10).map(_ => ev).reduce(_ unionAll _)
      .repartition(48).write.parquet(s"$stage/in")
    val schema = spark.read.parquet(s"$stage/in").schema

    // engine with one active drop-step so every batch exercises the
    // control-store read + chain compilation the real firehose pays
    val engine = SidelineEngine.inMemory(new LogSource {
      val namespace = "bench"
      def read(s: SparkSession): DataFrame = s.read.parquet(s"$stage/in")
    })
    engine.store.persist(SidelinePayload("bench-step", SidelineType.Start,
      FilterSpec.KeyIn("event_type", Seq("error")),
      ConsumerState.empty, None))

    val emitted = new LongAdder; val filtered = new LongAdder
    val batches = new LongAdder
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamingFirehose.run(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "12").parquet(s"$stage/in"),
      engine,
      mainSink = (df, _) => { emitted.add(df.count()); batches.increment() },
      onMetrics = m => filtered.add(m.filtered),
      trigger = Trigger.AvailableNow(),
      queryName = "graft-stream-bench")
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val total = emitted.sum + filtered.sum
    Result(total / sec, total, emitted.sum, filtered.sum, batches.sum, sec)
  }

  /** The NATIVE-connector twin of [[run]]: the same ×10 events volume,
    * but consumed through graftlog's MicroBatchStream (admission via
    * `maxOffsetsPerTrigger`) and PRODUCED into a second graftlog
    * through the V2 streaming sink (clustered write, task-local offset
    * assignment, staged-rename epoch commit) — the end-to-end
    * source→sink throughput of the connector pair. Exactly-once is
    * asserted, not assumed: the downstream row count must equal the
    * upstream's. */
  def runGraftLog(spark: SparkSession, sfDir: String): Result = {
    import graft.sources.GraftLog
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val stage = java.nio.file.Files.createTempDirectory("graft-streambench-log").toString
    val ev = Tables.events(spark, sfDir)
    val staged = (1 to 10).map(_ => ev).reduce(_ unionAll _)
      .selectExpr("cast(user_id % 8 as int) as partition",
        "cast(event_id as string) as key", "event_type as value")
    val w = Window.partitionBy("partition").orderBy("key", "value")
    GraftLog.materialize(
      staged.withColumn("offset", row_number().over(w).cast("long") - 1),
      s"$stage/in")
    val n = spark.read.parquet(s"$stage/in").count()

    val t0 = System.nanoTime()
    val q = spark.readStream.format("graftlog").option("path", s"$stage/in")
      .option("maxOffsetsPerTrigger", (n / 4 + 1).toString)
      .load()
      .selectExpr("partition", "cast(-1 as long) as offset", "key", "value")
      .writeStream.format("graftlog")
      .option("path", s"$stage/out").option("offsets", "assign")
      .option("checkpointLocation", s"$stage/ckpt")
      .trigger(Trigger.AvailableNow())
      .queryName("graft-stream-bench-log").start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    // assert through a DATA path, deliberately NOT the connector: a
    // graftlog count() is answered from footer stats (this round's
    // aggregate pushdown) and would miss exactly the duplication/loss
    // this check exists to catch. Distinctness catches a replayed
    // segment whose offsets overlap.
    val out = spark.read.parquet(s"$stage/out").selectExpr("partition", "offset")
    val outN = out.count()
    val outDistinct = out.distinct().count()
    require(outN == n && outDistinct == n,
      s"native source→sink loop lost or duplicated rows: " +
        s"$outN rows / $outDistinct distinct of $n")
    // committed epochs = done markers under the sink's producer scope
    val pd = new org.apache.hadoop.fs.Path(s"$stage/out/_producer")
    val fs = pd.getFileSystem(spark.sessionState.newHadoopConf())
    val batches =
      if (!fs.exists(pd)) 0L
      else fs.listStatus(pd).toSeq.filter(_.isDirectory)
        .flatMap(d => fs.listStatus(d.getPath).toSeq)
        .count(st => st.getPath.getName.forall(_.isDigit)).toLong
    Result(n / sec, n, outN, 0, batches, sec)
  }

  final case class DedupIngestResult(
      plainRowsPerSec: Double, bloomRowsPerSec: Double,
      rows: Long, kept: Long, bypassFraction: Double)

  /** Measure the streaming catalog-dedup ingest path: the SAME staged
    * document stream driven through the plain stream-static anti-join
    * face and the Bloom-prefiltered face, plus the measured
    * definitely-new bypass fraction (rows whose fingerprint the filter
    * has provably never seen — the mass that skips the anti-join
    * entirely). Both faces must keep identical row counts (the split is
    * output-equivalent by construction; this drive asserts it). */
  def runDedupIngest(spark: SparkSession, sfDir: String): DedupIngestResult = {
    import graft.operators.IncrementalDedup
    val stage = java.nio.file.Files.createTempDirectory("graft-dedupingest").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    // ×10 the corpus as the arriving stream (steady-state ingest volume);
    // catalog = the even-id half, so roughly half the stream is new
    (1 to 10).map(_ => docs).reduce(_ unionAll _)
      .repartition(24).write.parquet(s"$stage/in")
    val catalogTable = "graft_streambench_cat_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    IncrementalDedup.writeCatalog(
      docs.filter(col("doc_id") % 2 === 0), s"$stage/cat", catalogTable)
    val bloom = IncrementalDedup.catalogBloom(spark, catalogTable)
    val schema = spark.read.parquet(s"$stage/in").schema

    def drive(face: DataFrame => DataFrame): (Double, Long) = {
      val kept = new LongAdder
      val t0 = System.nanoTime()
      val q = face(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "6").parquet(s"$stage/in"))
        .writeStream
        .foreachBatch((df: DataFrame, _: Long) => kept.add(df.count()))
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          s"$stage/ckpt_${java.util.UUID.randomUUID().toString.take(8)}")
        .start()
      q.awaitTermination()
      ((System.nanoTime() - t0) / 1e9, kept.sum)
    }

    val (plainSec, keptPlain) =
      drive(IncrementalDedup.dedupStreamAgainstCatalog(_, catalogTable))
    val (bloomSec, keptBloom) =
      drive(IncrementalDedup.dedupStreamAgainstCatalogBloom(_, catalogTable, bloom))
    require(keptPlain == keptBloom,
      s"bloom face diverged: plain=$keptPlain bloom=$keptBloom")
    val staged = spark.read.parquet(s"$stage/in")
    val rows = staged.count()
    val bypass = staged
      .withColumn("fingerprint", md5(col("text")))
      .filter(!IncrementalDedup.mightContainColumn(bloom))
      .count().toDouble / rows
    DedupIngestResult(rows / plainSec, rows / bloomSec, rows, keptPlain, bypass)
  }

  final case class CurateIngestResult(rowsPerSec: Double, rows: Long, admitted: Long)

  /** Measure the streaming CURATION ingest face
    * ([[graft.operators.TrainingPipeline.curateStreamWriter]]): the
    * staged document stream driven through gate → redact → keepers →
    * exact-catalog → fuzzy-catalog per micro-batch. Catalogs are built
    * from the even-id half's POST-REDACTION text (the face's contract:
    * fingerprints and bands index what the pipeline admits, not raw
    * input), so roughly half the stream drops as history and the rest
    * faces the gates. */
  def runCurateIngest(spark: SparkSession, sfDir: String): CurateIngestResult = {
    import graft.operators.{IncrementalDedup, Redaction, TrainingPipeline}
    val stage = java.nio.file.Files.createTempDirectory("graft-curateingest").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    (1 to 5).map(_ => docs).reduce(_ unionAll _)
      .repartition(24).write.parquet(s"$stage/in")
    val redactedEvens = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("text", Redaction.redactColumn(col("text")))
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val fpTable = s"graft_sb_curfp_$tag"
    val bandTable = s"graft_sb_curband_$tag"
    IncrementalDedup.writeCatalog(redactedEvens, s"$stage/fpcat", fpTable)
    IncrementalDedup.writeBandCatalog(redactedEvens, s"$stage/bandcat", bandTable)
    val schema = spark.read.parquet(s"$stage/in").schema
    val admitted = new LongAdder
    val t0 = System.nanoTime()
    val q = TrainingPipeline.curateStreamWriter(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "6").parquet(s"$stage/in"),
        fpTable, bandTable, redactedEvens) { df => admitted.add(df.count()); () }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stage/ckpt")
      .start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(s"$stage/in").count()
    CurateIngestResult(rows / sec, rows, admitted.sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, sfDir)
    println(f"""{"metric":"stream_rows_per_sec","value":${r.rowsPerSec}%.0f,"unit":"rows/sec","rows":${r.rows},"emitted":${r.emitted},"filtered":${r.filtered},"batches":${r.batches},"seconds":${r.seconds}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
