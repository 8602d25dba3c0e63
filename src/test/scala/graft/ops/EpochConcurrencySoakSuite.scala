package graft.ops

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLongArray, AtomicReference}

/**
 * CONCURRENT-FACE SOAK (r16) — what reader/maintenance concurrency the
 * epoch layer actually supports, driven instead of assumed. The r16
 * first run of this suite found the honest boundary: ops that only ADD
 * state (write+mark, late mark) or delete INVISIBLE state (sweepTorn —
 * unmarked epochs are partition-pruned out of every committed plan)
 * are safe under any same-JVM reader; ops that DELETE VISIBLE state
 * (expireBelow, compact) can yank files out from under a reader whose
 * plan resolved before the delete — the classic snapshot-expiry race
 * every table format has (Iceberg/Delta answer it with RETENTION).
 *
 * So the contract this suite pins, in two phases:
 *
 *  A. SAFE-OP SOAK — write/mark/late-mark/sweepTorn, plus expire WITH A
 *     GRACE EPOCH (keep = latest − 1) under a reader-freshness bound
 *     (no read older than one whole maintenance step — enforced by the
 *     writer waiting for every reader to complete a loop before each
 *     delete-bearing op, the "retention ≥ max reader runtime"
 *     deployment rule made literal). Readers use the supersede faces
 *     (committed() and filterLatest). ZERO exceptions, every result
 *     explainable by the linearizable window.
 *
 *  B. DELETE-RACE PIN — expire with NO grace and compact, racing
 *     committed/latest/union readers freely. A reader either sees a
 *     model-window state or fails LOUDLY (missing-file read error);
 *     a silently-wrong row set is the one outcome that must never
 *     happen, and the suite proves the loud path is reachable is not
 *     required (races are probabilistic) — only that no silent
 *     divergence ever surfaces.
 *
 * Window protocol: the writer appends each externally-visible state to
 * an append-only history immediately BEFORE the call that publishes
 * it; a reader's result must equal some state in [v0−1, v1] where v0
 * and v1 are the history versions at its start and end.
 */
class EpochConcurrencySoakSuite extends SparkSuite {

  private final case class VisState(committed: Seq[Long],
      union: Set[Long], latest: Set[Long])

  private final class History {
    private val states = new java.util.concurrent.CopyOnWriteArrayList[VisState]()
    def append(s: VisState): Unit = { states.add(s); () }
    def version: Int = states.size - 1
    def window(v0: Int, v1: Int): Seq[VisState] = {
      val lo = math.max(0, v0 - 1)
      (lo to v1).map(states.get)
    }
  }

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

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def writeRows(root: String, e: Long, ids: Set[Long]): Unit =
    spark.createDataFrame(ids.toSeq.sorted.map(Tuple1(_))).toDF("id")
      .withColumn("epoch", lit(e))
      .write.mode("append").partitionBy("epoch").parquet(root)

  private def hasEpochDirs(root: String): Boolean =
    fs(root).listStatus(new Path(root))
      .exists(_.getPath.getName.startsWith("epoch="))

  /** Phase-A faces: metadata + the marker-first LAZY latest table (the
    * sanctioned construction — resolving markers before the listing is
    * what closes the mid-commit window this suite's first run caught
    * live: a listing taken before an epoch's rename-commit, with the
    * marker landing before the filter resolved, served an empty epoch). */
  private def readFace(root: String, kind: Int): VisState = kind % 3 match {
    case 0 => VisState(EpochCommit.committed(spark, root), null, null)
    case 1 =>
      val rows =
        if (!hasEpochDirs(root)) Set.empty[Long]
        else EpochCommit.latestTable(spark, root)
          .select("id").collect().map(_.getLong(0)).toSet
      VisState(null, null, rows)
    case _ =>
      val rows =
        if (!hasEpochDirs(root)) Set.empty[Long]
        else EpochCommit.committedTable(spark, root)
          .select("id").collect().map(_.getLong(0)).toSet
      VisState(null, rows, null)
  }

  /** Phase-B faces: the VALIDATING snapshots (pin → read → verify
    * markers survived → retry) — the reads that must survive UNGRACED
    * maintenance. */
  private def snapshotFace(root: String, kind: Int): VisState = kind % 3 match {
    case 0 => VisState(EpochCommit.committed(spark, root), null, null)
    case 1 =>
      val rows =
        if (!hasEpochDirs(root)) Set.empty[Long]
        else EpochCommit.latestSnapshot(spark, root)(
          _.select("id").collect().map(_.getLong(0)).toSet)
      VisState(null, null, rows)
    case _ =>
      val rows =
        if (!hasEpochDirs(root)) Set.empty[Long]
        else EpochCommit.committedSnapshot(spark, root)(
          _.select("id").collect().map(_.getLong(0)).toSet)
      VisState(null, rows, null)
  }

  private def explains(win: Seq[VisState], kind: Int, got: VisState): Boolean =
    kind % 3 match {
      case 0 => win.exists(_.committed == got.committed)
      case 1 => win.exists(_.latest == got.latest)
      case _ => win.exists(_.union == got.union)
    }

  test("phase A: graced expire + additive ops under fresh readers — zero torn reads") {
    for (seed <- Seq(11L, 47L)) soakSafe(seed, ops = 18, readers = 3)
  }

  private def soakSafe(seed: Long, ops: Int, readers: Int): Unit = {
    val root = java.nio.file.Files.createTempDirectory(s"epoch-soakA-$seed").toString
    writeRows(root, 1L, Set(0L)); EpochCommit.mark(spark, root, 1L)

    val hist = new History
    hist.append(VisState(Seq(1L), Set(0L), Set(0L)))
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    val ticks = new AtomicLongArray(readers)

    def readerLoop(k: Int): Runnable = () => {
      try {
        // phase A readers use the SUPERSEDE faces: committed + latest
        val kind = if (k % 2 == 0) 0 else 1
        while (!stop.get() && failure.get() == null) {
          val v0 = hist.version
          val got = readFace(root, kind)
          val v1 = hist.version
          assert(explains(hist.window(v0, v1), kind, got),
            s"[seed $seed] reader kind $kind observed $got, window " +
              s"[$v0-1,$v1] = ${hist.window(v0, v1).mkString("; ")}")
          ticks.incrementAndGet(k); ()
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t); () }
    }
    val threads = (0 until readers).map { k =>
      val t = new Thread(readerLoop(k), s"soakA-$seed-$k")
      t.setDaemon(true); t.start(); t
    }
    /** The deployment retention rule made literal: before any
      * delete-bearing op, wait until every reader has finished at least
      * one WHOLE read that started after now — then no active plan is
      * older than one maintenance step and the grace epoch covers it. */
    def awaitFreshReaders(): Unit = {
      val base = (0 until readers).map(ticks.get)
      val deadline = System.nanoTime() + 30L * 1000000000L
      while ((0 until readers).exists(k => ticks.get(k) < base(k) + 2) &&
        failure.get() == null && System.nanoTime() < deadline)
        Thread.sleep(10)
    }

    val rnd = new scala.util.Random(seed)
    val m = new SoakModel
    var nextRow = 1L
    try {
      for (i <- 0 until ops if failure.get() == null) {
        rnd.nextInt(100) match {
          case op if op < 50 => // refresh-style write; some torn
            val e = EpochCommit.nextEpoch(spark, root)
            m.torn.foreach(m.data -= _)
            val ids = (nextRow until nextRow + 1 + rnd.nextInt(3)).toSet
            nextRow += ids.size
            writeRows(root, e, ids)
            m.data(e) = ids
            if (rnd.nextInt(4) != 0) {
              m.markers += e
              hist.append(m.vis)
              EpochCommit.mark(spark, root, e)
            }
          case op if op < 60 => // late mark of a torn epoch
            m.torn.headOption.foreach { e =>
              m.markers += e
              hist.append(m.vis)
              EpochCommit.mark(spark, root, e)
            }
          case op if op < 75 => // sweep invisible debris: no transition
            EpochCommit.sweepTorn(spark, root)
            m.torn.foreach(m.data -= _)
          case _ => // GRACED expire: keep latest AND latest-1
            val keep = m.committed.lastOption.getOrElse(0L) - 1
            val goes = m.committed.filter(_ < keep)
            if (goes.nonEmpty) awaitFreshReaders()
            // one epoch per call so each history append immediately
            // precedes exactly the transition it describes (a bulk call
            // would let a reader start between appended states and the
            // on-disk deletes, putting its view beyond the window slack)
            goes.foreach { e =>
              m.markers -= e; m.data -= e
              hist.append(m.vis)
              EpochCommit.expireBelow(spark, root, e + 1)
            }
        }
      }
      Thread.sleep(250)
    } finally {
      stop.set(true)
      threads.foreach(_.join(30000))
    }
    if (failure.get() != null) throw failure.get()
    assert(EpochCommit.committed(spark, root) === m.committed)
    assert(readFace(root, 1).latest === m.latest)
  }

  test("phase B: ungraced expire and compact racing readers never yield a silently-wrong state") {
    val root = java.nio.file.Files.createTempDirectory("epoch-soakB").toString
    writeRows(root, 1L, Set(0L)); EpochCommit.mark(spark, root, 1L)
    val hist = new History
    hist.append(VisState(Seq(1L), Set(0L), Set(0L)))
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    val loudFailures = new java.util.concurrent.atomic.AtomicLong(0)

    def readerLoop(kind: Int): Runnable = () => {
      try {
        while (!stop.get() && failure.get() == null) {
          val v0 = hist.version
          val got =
            try Some(snapshotFace(root, kind))
            catch {
              // the DOCUMENTED loud path: a snapshot that exhausted its
              // retries under continuous expiry, or a raw missing-file
              // error from the metadata face
              case e: Throwable
                  if Option(e.getMessage).exists(m =>
                    m.contains("FILE_NOT_EXIST") ||
                      m.contains("does not exist") ||
                      m.contains("PATH_NOT_FOUND") ||
                      m.contains("under the reader")) =>
                loudFailures.incrementAndGet(); None
            }
          val v1 = hist.version
          got.foreach { g =>
            assert(explains(hist.window(v0, v1), kind, g),
              s"SILENT divergence on kind $kind: $g not in " +
                s"[${hist.window(v0, v1).mkString("; ")}]")
          }
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t); () }
    }
    val threads = (0 until 3).map { k =>
      val t = new Thread(readerLoop(k), s"soakB-$k")
      t.setDaemon(true); t.start(); t
    }

    val rnd = new scala.util.Random(83L)
    val m = new SoakModel
    var nextRow = 1L
    try {
      for (i <- 0 until 16 if failure.get() == null) {
        rnd.nextInt(100) match {
          case op if op < 55 =>
            val e = EpochCommit.nextEpoch(spark, root)
            m.torn.foreach(m.data -= _)
            val ids = (nextRow until nextRow + 1 + rnd.nextInt(3)).toSet
            nextRow += ids.size
            writeRows(root, e, ids)
            m.data(e) = ids
            m.markers += e
            hist.append(m.vis)
            EpochCommit.mark(spark, root, e)
          case op if op < 80 => // UNGRACED expire mid-read
            val keep = m.committed.lastOption.getOrElse(0L)
            val goes = m.committed.filter(_ < keep)
            goes.foreach { e => // one epoch per call, as in phase A
              m.markers -= e; m.data -= e
              hist.append(m.vis)
              EpochCommit.expireBelow(spark, root, e + 1)
            }
          case _ => // compact mid-read
            m.torn.foreach(m.data -= _)
            if (m.committed.length > 1) {
              val target = m.committed.last + 1
              val union = m.union
              m.committed.toList.foreach { e => m.markers -= e; m.data -= e }
              m.markers += target
              m.data(target) = union
              hist.append(m.vis)
            }
            EpochCommit.compact(spark, root,
              () => EpochCommit.filterCommitted(spark.read.parquet(root), root),
              EpochCommit.compactParquet(root))
        }
      }
      Thread.sleep(250)
    } finally {
      stop.set(true)
      threads.foreach(_.join(30000))
    }
    if (failure.get() != null) throw failure.get()
    // settled state model-exact; loud failures are allowed (and counted
    // for the record), silent divergence was asserted against in-loop
    assert(EpochCommit.committed(spark, root) === m.committed)
    assert(readFace(root, 1).latest === m.latest)
    info(s"loud missing-file read failures during delete races: ${loudFailures.get()}")
  }
}
