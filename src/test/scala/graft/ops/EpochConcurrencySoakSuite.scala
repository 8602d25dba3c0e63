package graft.ops

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

/**
 * CONCURRENT-FACE SOAK (r16): the maintenance ops document a
 * single-writer window whose caveat is only about OTHER JVMs' marker
 * caches — same-JVM readers are allowed to race `refresh`-style
 * commits, `expireBelow`, `compact`, and `sweepTorn`. Nothing before
 * this suite drove that concurrency; it runs randomized writer-op
 * sequences with reader threads hammering the three read faces
 * throughout, checked against a LINEARIZABLE-WINDOW model:
 *
 * The writer appends every externally-visible state (committed set,
 * union rows, latest rows) to an append-only history IMMEDIATELY
 * BEFORE the protocol call that makes it visible. A reader records the
 * history version at read start (v0) and end (v1); its result must
 * equal one of states[v0−1 .. v1] (the −1 covers a reader that started
 * after the append but before the transition landed). Any read
 * exception is a TORN READ and fails the suite — the property the
 * atomic-marker design claims.
 */
class EpochConcurrencySoakSuite extends SparkSuite {

  private final case class VisState(committed: Seq[Long],
      union: Set[Long], latest: Set[Long])

  /** Driver-side mirror of the protocol state (seeded with epoch 1). */
  private final class SoakModel {
    val data = scala.collection.mutable.Map(1L -> Set(0L))
    val markers = scala.collection.mutable.Set(1L)
    def committed: Seq[Long] = markers.toSeq.sorted
    def torn: Seq[Long] = data.keys.filterNot(markers).toSeq.sorted
    def union: Set[Long] = committed.flatMap(e => data.getOrElse(e, Set.empty)).toSet
    def latest: Set[Long] =
      committed.lastOption.map(data.getOrElse(_, Set.empty)).getOrElse(Set.empty)
    def vis: VisState = VisState(committed, union, latest)
  }

  private final class History {
    private val states = new java.util.concurrent.CopyOnWriteArrayList[VisState]()
    def append(s: VisState): Unit = { states.add(s); () }
    def version: Int = states.size - 1
    def window(v0: Int, v1: Int): Seq[VisState] = {
      val lo = math.max(0, v0 - 1)
      (lo to v1).map(states.get)
    }
  }

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def writeRows(root: String, e: Long, ids: Set[Long]): Unit =
    spark.createDataFrame(ids.toSeq.sorted.map(Tuple1(_))).toDF("id")
      .withColumn("epoch", lit(e))
      .write.mode("append").partitionBy("epoch").parquet(root)

  private def hasEpochDirs(root: String): Boolean =
    fs(root).listStatus(new Path(root))
      .exists(_.getPath.getName.startsWith("epoch="))

  test("reader threads never see a torn or unexplainable state across " +
    "write/mark/sweep/expire/compact interleavings") {
    for (seed <- Seq(11L, 47L)) soak(seed, ops = 22, readers = 3)
  }

  private def soak(seed: Long, ops: Int, readers: Int): Unit = {
    val root = java.nio.file.Files.createTempDirectory(s"epoch-soak-$seed").toString
    // seed epoch 1 so readers always have SOMETHING to scan
    writeRows(root, 1L, Set(0L)); EpochCommit.mark(spark, root, 1L)

    val hist = new History
    hist.append(VisState(Seq(1L), Set(0L), Set(0L)))
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)

    def readerLoop(kind: Int): Runnable = () => {
      try {
        while (!stop.get() && failure.get() == null) {
          val v0 = hist.version
          val observed: VisState = kind % 3 match {
            case 0 =>
              VisState(EpochCommit.committed(spark, root), null, null)
            case 1 =>
              val rows =
                if (!hasEpochDirs(root)) Set.empty[Long]
                else EpochCommit
                  .filterCommitted(spark.read.parquet(root), root)
                  .select("id").collect().map(_.getLong(0)).toSet
              VisState(null, rows, null)
            case _ =>
              val rows =
                if (!hasEpochDirs(root)) Set.empty[Long]
                else EpochCommit
                  .filterLatest(spark.read.parquet(root), root)
                  .select("id").collect().map(_.getLong(0)).toSet
              VisState(null, null, rows)
          }
          val v1 = hist.version
          val win = hist.window(v0, v1)
          val ok = kind % 3 match {
            case 0 => win.exists(_.committed == observed.committed)
            case 1 => win.exists(_.union == observed.union)
            case _ => win.exists(_.latest == observed.latest)
          }
          assert(ok, s"[seed $seed] reader kind $kind observed " +
            s"$observed not explainable by any state in window " +
            s"[$v0-1, $v1]: ${win.mkString("; ")}")
        }
      } catch {
        case t: Throwable => failure.compareAndSet(null, t); ()
      }
    }

    val threads = (0 until readers).map { k =>
      val t = new Thread(readerLoop(k), s"soak-reader-$seed-$k")
      t.setDaemon(true); t.start(); t
    }

    val rnd = new scala.util.Random(seed)
    val m = new SoakModel
    var nextRow = 1L

    try {
      for (i <- 0 until ops if failure.get() == null) {
        rnd.nextInt(100) match {
          case op if op < 45 => // refresh-style write; 25% torn
            val e = EpochCommit.nextEpoch(spark, root)
            m.torn.foreach(m.data -= _)
            val ids = (nextRow until nextRow + 1 + rnd.nextInt(3)).toSet
            nextRow += ids.size
            writeRows(root, e, ids)
            m.data(e) = ids
            if (rnd.nextInt(4) != 0) {
              m.markers += e
              hist.append(m.vis) // visible at the next line's mark
              EpochCommit.mark(spark, root, e)
            }
          case op if op < 55 =>
            m.torn.headOption.foreach { e =>
              m.markers += e
              hist.append(m.vis)
              EpochCommit.mark(spark, root, e)
            }
          case op if op < 70 =>
            EpochCommit.sweepTorn(spark, root)
            m.torn.foreach(m.data -= _) // no visible transition
          case op if op < 88 =>
            val keep = m.committed.lastOption.getOrElse(0L)
            val goes = m.committed.filter(_ < keep)
            goes.foreach { e => m.markers -= e; m.data -= e }
            if (goes.nonEmpty) hist.append(m.vis)
            EpochCommit.expireBelow(spark, root, keep)
          case _ =>
            m.torn.foreach(m.data -= _) // compact sweeps first
            if (m.committed.length > 1) {
              val target = m.committed.last + 1
              val union = m.union
              m.committed.toList.foreach { e => m.markers -= e; m.data -= e }
              m.markers += target
              m.data(target) = union
              hist.append(m.vis) // visible at the fold's mark
            }
            EpochCommit.compact(spark, root,
              () => EpochCommit.filterCommitted(spark.read.parquet(root), root),
              EpochCommit.compactParquet(root))
        }
      }
      // let readers race the settled end state a moment longer
      Thread.sleep(250)
    } finally {
      stop.set(true)
      threads.foreach(_.join(30000))
    }
    if (failure.get() != null) throw failure.get()

    // settled end state agrees with the model exactly
    assert(EpochCommit.committed(spark, root) === m.committed)
    val endLatest =
      if (!hasEpochDirs(root)) Set.empty[Long]
      else EpochCommit.filterLatest(spark.read.parquet(root), root)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(endLatest === m.latest)
  }
}
