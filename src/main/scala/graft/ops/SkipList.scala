package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table-backed skip-list — the at-scale form of the reference's KeyFilter
 * sideline recipe (sideline/recipes/trigger/KeyFilter.java:36-50).
 *
 * [[graft.filter.FilterSpec.KeyIn]] inlines its keys as a literal `isin`,
 * which is right for the recipe's original shape (an operator skipping a
 * handful of tenants) and wrong at 100 TB: a 1M-key tenant list becomes a
 * 1M-literal expression — chain-JSON bloat on the control store, codegen
 * blowup at plan time, and a driver that re-parses the whole list every
 * micro-batch. A SkipList keeps the keys where data belongs — a parquet
 * directory holding one `key` column (a Delta/Iceberg table at warehouse
 * scale) — and applies them as a BROADCAST join: `left_anti` for "keep
 * everything not listed", `left_semi` for the sideline replay's "only
 * what was dropped". The key set streams from storage into one broadcast
 * exchange; it never exists as an expression tree, and the chain JSON
 * carries only the table path.
 *
 * NULL semantics match [[graft.filter.FilterSpec.KeyIn]]: a NULL field
 * never equals a key, so anti-join keeps NULL-field rows ("NULL verdict =
 * not dropped") and semi-join excludes them — the same truth table the
 * scalar chain compiles, preserving firehose ∪ sideline ≡ input.
 */
final case class SkipList(path: String) {

  /** The key relation, normalized to one distinct string `key` column.
    * Distinct matters for [[annotateMatch]] (a duplicated key would
    * duplicate matched rows through the outer join) and is harmless for
    * the semi/anti forms; the extra exchange is over keys only, which are
    * broadcast-sized by contract. */
  def keys(spark: SparkSession): DataFrame =
    spark.read.parquet(path)
      .select(col(SkipList.KeyColumn).cast("string").as(SkipList.JoinKey))
      .distinct()

  /** Keep rows whose `field` is NOT in the list (broadcast anti-join). */
  def antiJoin(df: DataFrame, field: Column): DataFrame =
    df.join(broadcast(keys(df.sparkSession)),
      field === col(SkipList.JoinKey), "left_anti")

  /** Keep ONLY rows whose `field` IS in the list (broadcast semi-join) —
    * the sideline-replay side of the split. */
  def semiJoin(df: DataFrame, field: Column): DataFrame =
    df.join(broadcast(keys(df.sparkSession)),
      field === col(SkipList.JoinKey), "left_semi")

  /** Annotate every row with a never-NULL boolean `as` column: true iff
    * `field` is in the list. For verdict-annotation sites (the firehose's
    * routing column) where rows must not be filtered away. */
  def annotateMatch(df: DataFrame, field: Column, as: String): DataFrame =
    df.join(
        broadcast(keys(df.sparkSession).withColumn(SkipList.HitColumn, lit(true))),
        field === col(SkipList.JoinKey), "left")
      .withColumn(as, coalesce(col(SkipList.HitColumn), lit(false)))
      .drop(SkipList.JoinKey, SkipList.HitColumn)
}

object SkipList {
  /** Column name the backing table must carry. */
  val KeyColumn = "key"
  /** Internal join-side alias — collision-proof against log schemas
    * (which commonly carry their own `key`). */
  private[ops] val JoinKey = "__skiplist_key"
  private[ops] val HitColumn = "__skiplist_hit"

  /** Write a key table (helper for tests and operator tooling; real
    * deployments write/maintain the table with their own pipelines). */
  def write(spark: SparkSession, path: String, keys: Seq[String]): Unit = {
    import spark.implicits._
    keys.toDF(KeyColumn).write.mode("overwrite").parquet(path)
  }
}
