package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Marker-committed epoch appends for partitioned parquet layouts — the
 * [[graft.streaming.IdempotentBatchSink]] commit protocol generalized
 * to any grow-by-appending index (fingerprint/band catalogs, the IVF
 * `assigned`/`codes` layouts): every append lands in an OUTERMOST
 * `epoch=<n>` partition and becomes visible only once its marker file
 * `_epochs/<n>` exists. A crash anywhere mid-append leaves a torn,
 * unmarked epoch no committed-view reader ever lists, and the next
 * append sweeps it before writing — without this, a bare
 * `mode("append")` that dies between files leaves a half-appended
 * index that silently under-serves forever after.
 *
 * Epoch OUTERMOST is load-bearing twice: the committed-epoch predicate
 * prunes torn data from listing metadata alone, and sweeping a torn
 * attempt is one top-level directory delete. Inner partition columns
 * (`cell`, buckets) keep their own pruning/bucketing untouched.
 *
 * Single writer per root (the marker namespace is the serialization
 * point — any file-based commit protocol's stance). Cost at 100 TB:
 * two metadata RPCs per epoch, nothing row-proportional.
 */
object EpochCommit {

  private def hadoopFs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sessionState.newHadoopConf())

  private def epochsDir(root: String) = new Path(root, "_epochs")

  /** Epochs whose commit marker exists — the readable view of `root`. */
  def committed(s: SparkSession, root: String): Seq[Long] = {
    val d = epochsDir(root)
    val fs = hadoopFs(s, d)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).sorted
  }

  /** The commit point: after this returns, `epoch` is visible. */
  def mark(s: SparkSession, root: String, epoch: Long): Unit = {
    val d = epochsDir(root)
    val fs = hadoopFs(s, d)
    fs.mkdirs(d)
    fs.create(new Path(d, epoch.toString), true).close()
  }

  /** Delete torn (data present, marker absent) top-level `epoch=` dirs —
    * crash leftovers. Invisible to readers either way; sweeping keeps a
    * retry from double-writing into the reused epoch number. */
  def sweepTorn(s: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = hadoopFs(s, rootPath)
    if (!fs.exists(rootPath)) return
    val live = committed(s, root).toSet
    fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("epoch=")) {
        val e = n.stripPrefix("epoch=")
        if (e.forall(_.isDigit) && !live.contains(e.toLong))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** Sweep, then hand out the next epoch number to write under. */
  def nextEpoch(s: SparkSession, root: String): Long = {
    sweepTorn(s, root)
    committed(s, root).lastOption.getOrElse(0L) + 1
  }

  /** Does `epoch`'s commit marker exist? EXECUTOR-SAFE: takes an
    * explicit Hadoop conf (ship the driver's via
    * [[org.apache.spark.sql.graft.Shim.broadcastConf]]) — the marker
    * namespace layout lives HERE, beside mark/committed/sweepTorn,
    * never re-derived by callers. `true` verdicts cache per JVM
    * (markers are never deleted); `false` re-checks, because a torn
    * epoch's number is reused by the retry. */
  def markerExists(root: String, epoch: Long,
      conf: org.apache.hadoop.conf.Configuration): Boolean =
    markerCache.contains((root, epoch)) || {
      val p = new Path(epochsDir(root), epoch.toString)
      val found = p.getFileSystem(conf).exists(p)
      if (found) markerCache.put((root, epoch), ())
      found
    }

  private val markerCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Unit]

  /** Restrict an epoch-partitioned frame to COMMITTED epochs and drop
    * the protocol column — the only sanctioned read path. The predicate
    * is a partition filter: pruned from listing metadata, no data
    * cost. A LEGACY layout (no epoch partition — persisted by a
    * pre-protocol build) passes through untouched, mirroring
    * `IncrementalDedup.committedTable`'s guard. */
  def filterCommitted(df: DataFrame, root: String): DataFrame =
    if (!df.columns.contains("epoch")) df
    else df.filter(col("epoch").isin(committed(df.sparkSession, root): _*))
      .drop("epoch")

  /** True iff `root` holds a LEGACY (pre-protocol) layout: data exists
    * — partition directories OR flat data files (an unpartitioned
    * pre-protocol write has bare part-*.parquet at root) — and none of
    * it is under an `epoch=` level. Appending epoch partitions next to
    * either would corrupt partition inference — appenders must fail
    * loudly instead. */
  def isLegacyLayout(s: SparkSession, root: String): Boolean = {
    val rootPath = new Path(root)
    val fs = hadoopFs(s, rootPath)
    if (!fs.exists(rootPath)) return false
    val entries = fs.listStatus(rootPath).toSeq
      .filterNot(st => st.getPath.getName.startsWith("_") ||
        st.getPath.getName.startsWith("."))
    val dirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    val flatData = entries.exists(!_.isDirectory)
    (dirs.nonEmpty || flatData) && !dirs.exists(_.startsWith("epoch="))
  }

  /** Guard an append against a legacy layout (fail-loud beats silently
    * mixing `epoch=` dirs into a flat partitioning). */
  def requireEpochLayout(s: SparkSession, root: String): Unit =
    require(!isLegacyLayout(s, root),
      s"$root holds a pre-epoch (legacy) layout — rebuild it (or migrate by " +
        "moving existing partitions under epoch=0 and marking epoch 0) " +
        "before appending")
}
