package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Small-files compaction — the maintenance pass every long-lived
 * parquet dataset needs: streaming sinks, per-batch appends, and
 * over-parallel writes leave thousands of KB-sized files whose
 * open/footer overhead dominates scan time at scale.
 *
 * Scale shape: the shrink path uses `coalesce`, which MERGES read
 * partitions without any shuffle — each output task concatenates a few
 * input files, the only data movement is the read+write itself (already
 * unavoidable for a rewrite). `repartition` (a full round-robin
 * shuffle) is used ONLY when the target exceeds the current layout —
 * growing parallelism genuinely requires redistribution. The sizing
 * decision comes from a driver-side FS listing: file COUNT and BYTE
 * totals are metadata, never data.
 */
object Compaction {

  /** What the listing found and what the rewrite will do.
    * `targetPartitions` = ceil(bytes / targetBytes), min 1. */
  final case class Plan(files: Int, bytes: Long, targetPartitions: Int)

  /** Metadata-only: list the dataset's data files (recursively, skipping
    * hidden/_SUCCESS entries) and size the rewrite. */
  def plan(spark: SparkSession, path: String, targetBytes: Long): Plan = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var files = 0
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        files += 1
        bytes += f.getLen
      }
    }
    val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    Plan(files, bytes, target)
  }

  /** The dataset re-laid-out to the plan, NOT yet written: `coalesce`
    * (shuffle-free) when shrinking to fewer partitions, `repartition`
    * only when growing. Exposed separately so callers (and the suite)
    * can inspect the execution plan before paying for the rewrite. */
  def compacted(spark: SparkSession, path: String, targetBytes: Long): (DataFrame, Plan) = {
    val pl = plan(spark, path, targetBytes)
    val df = spark.read.parquet(path)
    val laid =
      if (pl.targetPartitions <= df.rdd.getNumPartitions) df.coalesce(pl.targetPartitions)
      else df.repartition(pl.targetPartitions)
    (laid, pl)
  }

  /** Rewrite `path` into `dest` at ~`targetBytes` per file and return
    * the plan that sized it. `dest` must differ from `path`: compaction
    * is write-aside + swap (an in-place overwrite that fails mid-write
    * destroys the dataset; the caller owns the atomic rename). */
  def compact(spark: SparkSession, path: String, dest: String, targetBytes: Long): Plan = {
    require(new Path(dest) != new Path(path), "compact writes aside, never in place")
    val (df, pl) = compacted(spark, path, targetBytes)
    df.write.mode("overwrite").parquet(dest)
    pl
  }
}
