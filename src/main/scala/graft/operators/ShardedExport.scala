package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialization step of the curation pipeline: write the corpus as S
 * balanced parquet shards in deterministic shuffle order — the layout a
 * training job reads (shard = unit of parallel download, in-shard order
 * = training order).
 *
 * Layout contract (what [[graft.operators.Sampling]]'s `export_shards`
 * query reports and ShardedExportSuite asserts on the files):
 *  - shard k holds exactly the docs with ⌊(pos−1)·S / N⌋ = k — contiguous
 *    position ranges, sizes within 1 of N/S, nothing interleaved;
 *  - rows inside each shard file are stored in ascending `pos`, so a
 *    reader streaming one shard sees the training order without sorting.
 *
 * Scale shape: positions come from the distributed prefix-sum
 * decomposition (no global window — see `shuffledPositions`); the write
 * shuffles ONCE, hash-partitioned on the shard id so each of the S
 * writer tasks owns exactly one shard directory (`partitionBy` splits
 * files by value; `repartition(S, shard)` bounds writer memory to one
 * shard's rows); `sortWithinPartitions(pos)` is a partition-local sort —
 * N/S rows per task, never a corpus sort. At 100 TB, S scales with the
 * cluster (shards of a few GB), and the one shuffle is the unavoidable
 * data movement of materializing a permutation.
 */
object ShardedExport {

  /** Corpus rows + their shard assignment, in the export layout's
    * pre-write shape. Exposed for tests and composition. */
  def withShards(s: SparkSession, dir: String, numShards: Int): DataFrame =
    Sampling.shuffledPositions(s, dir)
      .withColumn("shard",
        expr(s"cast(((pos - 1) * $numShards) div total as int)"))
      .drop("total")

  /** Write `<outDir>/shard=<k>/…parquet`, one balanced shard per
    * directory, rows in ascending `pos` within each file.
    *
    * Each file also carries a PARQUET BLOOM FILTER on `doc_id`: the
    * export is what downstream audits point-probe ("which shard holds
    * doc X", dedup back-references, deletion requests) — with S shards
    * a probe without blooms opens S files; with them it reads S footers
    * and opens ~1. Footer presence is suite-asserted, and the ~1%-FPP
    * default sizing is bounded by `ndv` = the shard's row count. */
  def write(s: SparkSession, dir: String, outDir: String,
      numShards: Int = Sampling.NumShards): Unit = {
    val sharded = withShards(s, dir, numShards)
    val ndvPerShard = math.max(1L,
      sharded.count() / numShards + 1)
    sharded
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", ndvPerShard.toString)
      .partitionBy("shard")
      .parquet(outDir)
  }
}
