package graft.sources

import graft.model.{ConsumerPartition, ConsumerState}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * A log over a growing directory of parquet files that CARRY native
 * (partition, offset) columns — the file-backed stand-in for a real
 * partitioned log when Kafka isn't available (and the pattern for
 * log-compacted lake tables). Unlike [[ParquetEventLog]] (which must
 * synthesize offsets with a window), offsets are data here, so:
 *  - bounded reads are pure pushdown-able filters (no shuffle at all);
 *  - STREAMING reads work: the file stream source tails the directory
 *    and the offset filter makes resume-from-snapshot exact — this is
 *    what a sideline RESUME runs on (SURVEY.md SL2).
 */
final case class FileLogSource(
    dir: String,
    schema: StructType,
    namespace: String = "file",
    maxFilesPerTrigger: Option[Int] = None) extends LogSource {

  require(Seq("partition", "offset").forall(schema.fieldNames.contains),
    "FileLogSource schema must carry native partition/offset columns")

  def read(spark: SparkSession): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/*")

  /** Unbounded streaming tail from after the given watermark state —
    * the RESUME path. Few partitions: the offset predicate composes with
    * the drop-step negation into one codegen'd filter. Past
    * [[LogSource.MaxInlineBounds]] partitions: a stream-static broadcast
    * join against the per-partition bound table, O(1) expression size
    * (the batch readBounded makes the same switch, and for the same
    * reason — a many-partition snapshot must not build a giant Or). */
  override def readStreamFrom(spark: SparkSession,
      from: ConsumerState = ConsumerState.empty): DataFrame = {
    val r = spark.readStream.schema(schema)
    val sr = maxFilesPerTrigger.fold(r)(n =>
      r.option("maxFilesPerTrigger", n.toString))
    val df = sr.parquet(s"$dir/*")
    val bounds = from.offsets.collect {
      case (ConsumerPartition(ns, p), off) if ns == namespace => p -> off
    }
    if (bounds.isEmpty) df
    else if (bounds.size <= LogSource.MaxInlineBounds) {
      val beforeStart = bounds.map { case (p, off) =>
        (col("partition") === p) && (col("offset") <= off)
      }.reduceOption(_ || _).getOrElse(lit(false))
      df.filter(!beforeStart)
    } else {
      import spark.implicits._
      val b = bounds.toSeq.toDF("partition", "__start_off")
      df.join(broadcast(b), Seq("partition"), "left")
        .filter(col("__start_off").isNull || col("offset") > col("__start_off"))
        .drop("__start_off")
    }
  }

  override def currentState(spark: SparkSession): ConsumerState = {
    val rows = read(spark).groupBy(col("partition"))
      .agg(max(col("offset")).as("end_offset")).collect()
    ConsumerState(rows.map(r =>
      ConsumerPartition(namespace, r.getInt(0)) -> r.getLong(1)).toMap)
  }
}
