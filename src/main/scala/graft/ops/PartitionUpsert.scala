package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Partition-scoped backfill/upsert — the "replace one day, touch nothing
 * else" maintenance op every partitioned warehouse table needs (late
 * data backfills, corrected extracts, reprocessed batches) on plain
 * parquet, no table format required: Spark's DYNAMIC partition-overwrite
 * mode makes an `overwrite` write replace ONLY the partition directories
 * the incoming frame actually contains rows for — every other partition
 * keeps its exact files (identity, stats, mtimes), so readers of
 * untouched days see no churn and a partition-pruned scan is invalidated
 * only where data really changed.
 *
 * Scale shape: the write is one shuffle-free pass over the NEW rows only
 * (partitioned-by column routing); the replaced directories' old files
 * drop atomically at commit. Cost ∝ the backfilled partitions, never the
 * table. The STATIC alternative (the default) would truncate the whole
 * table root first — the setting is the entire difference, which is why
 * this op pins it per-write instead of trusting session config.
 */
object PartitionUpsert {

  /** Write `df` (which must carry `partCol`) into `outDir` partitioned
    * by `partCol`, replacing exactly the partitions present in `df`. */
  def overwritePartitions(df: DataFrame, partCol: String, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      // per-write pin: session-level partitionOverwriteMode is a trap —
      // any other writer flipping it to static truncates the table
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(outDir)

  /** Initial full write with the same layout contract. */
  def writePartitioned(df: DataFrame, partCol: String, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .parquet(outDir)
}
