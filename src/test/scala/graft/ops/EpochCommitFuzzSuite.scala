package graft.ops

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/**
 * Seeded protocol fuzz of the epoch commit layer: random interleavings
 * of the protocol's own ops — write-next-epoch (with torn-crash
 * injection: data lands, marker doesn't), late mark of a torn epoch,
 * sweepTorn, expireBelow, whole-range compact — mirrored in a
 * driver-side model of (epoch dirs on disk, markers). After every op
 * the three read faces must agree with the model: `committed()` equals
 * the marker set (minus folded ranges), `filterCommitted` serves the
 * union of marked epochs' rows, `filterLatest` serves exactly the
 * newest marked epoch's rows. The scripted crash-ordering tests pin
 * specific orderings; this sweeps the op lattice for interactions the
 * scripts didn't think of (compact after torn write, expire after
 * compact, mark-late after sweep, …).
 */
class EpochCommitFuzzSuite extends SparkSuite {

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private final class Model {
    val data = scala.collection.mutable.Map.empty[Long, Set[Long]] // epoch -> row ids
    val markers = scala.collection.mutable.Set.empty[Long]
    def committed: Seq[Long] = markers.toSeq.sorted
    def torn: Seq[Long] = data.keys.filterNot(markers).toSeq.sorted
    def unionRows: Set[Long] =
      committed.flatMap(e => data.getOrElse(e, Set.empty)).toSet
    def latestRows: Set[Long] =
      committed.lastOption.map(e => data.getOrElse(e, Set.empty)).getOrElse(Set.empty)
  }

  private var nextRow = 0L
  private def writeRows(root: String, e: Long, k: Int): Set[Long] = {
    val ids = (nextRow until nextRow + k).toSet
    nextRow += k
    spark.createDataFrame(ids.toSeq.sorted.map(Tuple1(_)))
      .toDF("id")
      .withColumn("epoch", lit(e))
      .write.mode("append").partitionBy("epoch").parquet(root)
    ids
  }

  private def viewUnion(root: String): Set[Long] =
    if (!fs(root).listStatus(new Path(root)).exists(_.getPath.getName.startsWith("epoch=")))
      Set.empty
    else EpochCommit.filterCommitted(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).toSet

  private def viewLatest(root: String): Set[Long] =
    if (!fs(root).listStatus(new Path(root)).exists(_.getPath.getName.startsWith("epoch=")))
      Set.empty
    else EpochCommit.filterLatest(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).toSet

  private def fuzz(seed: Long, ops: Int): Unit = {
    val root = java.nio.file.Files.createTempDirectory(s"epochs-fuzz-$seed").toString
    val rnd = new scala.util.Random(seed)
    val m = new Model
    val trace = scala.collection.mutable.ListBuffer.empty[String]

    def check(at: String): Unit = {
      assert(EpochCommit.committed(spark, root) === m.committed,
        s"[seed $seed] committed diverged $at\n${trace.mkString("\n")}")
      assert(viewUnion(root) === m.unionRows,
        s"[seed $seed] filterCommitted rows diverged $at\n${trace.mkString("\n")}")
      assert(viewLatest(root) === m.latestRows,
        s"[seed $seed] filterLatest rows diverged $at\n${trace.mkString("\n")}")
    }

    for (i <- 0 until ops) {
      val op = rnd.nextInt(100)
      if (op < 45) { // write next epoch; 30% torn (marker never lands)
        val e = EpochCommit.nextEpoch(spark, root)
        // nextEpoch swept torn debris — mirror that first
        m.torn.foreach(m.data -= _)
        val crash = rnd.nextInt(10) < 3
        trace += s"$i: write e$e${if (crash) " TORN" else ""}"
        val ids = writeRows(root, e, 1 + rnd.nextInt(3))
        m.data(e) = ids
        if (!crash) {
          EpochCommit.mark(spark, root, e)
          m.markers += e
        }
      } else if (op < 55) { // late mark of a torn epoch (recovery finishes)
        m.torn.headOption match {
          case Some(e) =>
            trace += s"$i: late mark e$e"
            EpochCommit.mark(spark, root, e)
            m.markers += e
          case None => trace += s"$i: late mark (none torn)"
        }
      } else if (op < 70) { // sweep torn debris
        trace += s"$i: sweepTorn"
        val swept = EpochCommit.sweepTorn(spark, root)
        assert(swept === m.torn,
          s"[seed $seed] sweepTorn returned $swept, model torn ${m.torn}\n${trace.mkString("\n")}")
        m.torn.foreach(m.data -= _)
      } else if (op < 85) { // expire superseded epochs
        trace += s"$i: expire"
        val keep = m.committed.lastOption.getOrElse(0L)
        val expired = EpochCommit.expireBelow(spark, root, keep)
        assert(expired === m.committed.filter(_ < keep),
          s"[seed $seed] expireBelow returned $expired\n${trace.mkString("\n")}")
        expired.foreach { e => m.markers -= e; m.data -= e }
      } else { // compact the whole committed range
        trace += s"$i: compact"
        // compact() runs recoverFold + sweepTorn first — without that
        // sweep a torn dir at hi+1 would mix its rows into the fold
        // target; mirror the sweep in the model
        m.torn.foreach(m.data -= _)
        val before = m.unionRows
        val target = EpochCommit.compact(spark, root,
          () => EpochCommit.filterCommitted(spark.read.parquet(root), root),
          EpochCommit.compactParquet(root))
        if (m.committed.length > 1) {
          assert(target === Some(m.committed.last + 1),
            s"[seed $seed] compact target $target\n${trace.mkString("\n")}")
          m.committed.foreach { e => m.markers -= e; m.data -= e }
          m.markers += target.get
          m.data(target.get) = before
        } else {
          assert(target === None,
            s"[seed $seed] compact of <=1 epochs must be None, got $target\n${trace.mkString("\n")}")
        }
      }
      check(s"after op $i (${trace.last})")
    }
  }

  test("random protocol interleavings keep all three read faces model-exact") {
    for (seed <- Seq(5L, 17L, 31L)) fuzz(seed, 40)
  }
}
