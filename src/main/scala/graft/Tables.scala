package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Central loader for the driver-provided parquet tables (TESTDATA.md).
 *
 * `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
 * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true`; with that
 * flag the column arrives as LONG nanos and is converted here to a real
 * timestamp at microsecond precision (the synthetic data has at most
 * microsecond resolution, and DuckDB's oracle truncates ns->us the same
 * way, so hashes line up). All other tables load as-is.
 */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Configs every engine SparkSession needs. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // SESSION INVARIANT, on deliberately for every query: rewrites
      // bare-aggregate-over-V2-scan plans to parquet footer reads with
      // identical results (semantics-neutral). Set here at bootstrap —
      // not flipped from inside a QueryDef — so any future V2 read
      // inherits it VISIBLY. Only `agg_footer_stats` produces a V2 scan
      // today (everything else plans V1 per `useV1SourceList`).
      .config("spark.sql.parquet.aggregatePushdown", "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // self-sufficient on sessions the driver builds without our configs:
    // the nanos flag is a dynamic SQL conf, set it before the schema read
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `ts div 1000` (integer division) — NOT `/ 1000` which is a double
    // divide: epoch-nanos (~1.7e18) exceed double's 53-bit mantissa and
    // come back off by up to a microsecond.
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
