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

  /** Metadata-only: list the dataset's data files (recursively) and size
    * the rewrite. A file is hidden if ANY path component below the base
    * starts with `_` or `.` — matching Spark's own InMemoryFileIndex
    * rule, so the plan counts exactly what `spark.read.parquet` will
    * read (a name-only check would count `_spark_metadata/9.compact`
    * and `_temporary/.../part-*.parquet` as data). */
  def plan(spark: SparkSession, path: String, targetBytes: Long): Plan = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val base = fs.makeQualified(new Path(path))
    val it = fs.listFiles(base, true)
    var files = 0
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val rel = base.toUri.relativize(f.getPath.toUri).getPath
      val hidden = rel.split("/")
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (!hidden) {
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
    * can inspect the execution plan before paying for the rewrite.
    * Refuses an EMPTY dataset (no data files ⇒ no schema to infer;
    * callers sweeping many paths should check `plan().files` first —
    * `compact` does). */
  def compacted(spark: SparkSession, path: String, targetBytes: Long): (DataFrame, Plan) = {
    val pl = plan(spark, path, targetBytes)
    require(pl.files > 0, s"$path has no data files — nothing to compact")
    val df = spark.read.parquet(path)
    val laid =
      if (pl.targetPartitions <= df.rdd.getNumPartitions) df.coalesce(pl.targetPartitions)
      else df.repartition(pl.targetPartitions)
    (laid, pl)
  }

  /** Rewrite `path` into `dest` at ~`targetBytes` per file and return
    * the plan that sized it. `dest` must differ from `path`: compaction
    * is write-aside + swap (an in-place overwrite that fails mid-write
    * destroys the dataset; the caller owns the atomic rename). The
    * guard compares FULLY RESOLVED paths — qualified by each path's own
    * filesystem and URI-normalized — so `..` segments, relative
    * spellings, and `file:/p` vs `/p` cannot sneak an in-place
    * overwrite past it. An empty source is a counted no-op, not a
    * schema-inference crash (maintenance sweeps hit empty dirs). */
  def compact(spark: SparkSession, path: String, dest: String, targetBytes: Long): Plan = {
    val conf = spark.sessionState.newHadoopConf()
    def resolved(s: String): java.net.URI = {
      val p = new Path(s)
      p.getFileSystem(conf).makeQualified(p).toUri.normalize()
    }
    require(resolved(dest) != resolved(path),
      "compact writes aside, never in place")
    val pl = plan(spark, path, targetBytes)
    if (pl.files == 0) pl
    else {
      val (df, _) = compacted(spark, path, targetBytes)
      df.write.mode("overwrite").parquet(dest)
      pl
    }
  }
}
