package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 * point — any file-based commit protocol's stance). The protocol keeps
 * committed epochs a DENSE range, and two scale guards lean on that:
 *
 *  - `_epochs/HEAD` records the range's `lo hi` bounds, so
 *    [[committed]] is a handful of existence probes instead of an
 *    O(#epochs) directory listing per read, and [[committedPredicate]]
 *    is a constant-size `epoch BETWEEN lo AND hi` partition filter
 *    instead of an IN-list that grows a literal per ingest batch
 *    (thousands of batches = thousands of literals in every reader
 *    plan).
 *  - [[compact]] folds the whole committed range into ONE epoch (a
 *    maintenance op for year-long ingest loops), journaled through
 *    `_epochs/FOLD` so a crash at any step either aborts or completes
 *    — never double-counts, never loses rows.
 *
 * Cost at 100 TB: two metadata RPCs per epoch append, ~four per
 * committed-view read, nothing row-proportional.
 */
object EpochCommit {

  private def hadoopFs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sessionState.newHadoopConf())

  private def epochsDir(root: String) = new Path(root, "_epochs")
  private def headPath(root: String) = new Path(epochsDir(root), "HEAD")
  private def foldPath(root: String) = new Path(epochsDir(root), "FOLD")
  private def markerPath(root: String, e: Long) =
    new Path(epochsDir(root), e.toString)

  // ---- tiny file IO for the HEAD / FOLD control files ----
  private def writeSmall(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
  private def readSmall(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](256)
        var n = in.read(b)
        while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
        Some(buf.toString("UTF-8").trim)
      } finally in.close()
    }
  private def parseLongs(s: String, n: Int): Option[Seq[Long]] = {
    val parts = s.split("\\s+").toSeq
    if (parts.length != n || !parts.forall(p => p.nonEmpty && p.forall(_.isDigit)))
      None
    else Some(parts.map(_.toLong))
  }

  /** Epochs whose commit marker exists — the readable view of `root`.
    * Fast path when the protocol's invariants hold (no fold in flight,
    * HEAD present): the dense `[lo, hi]` from HEAD, extended by probing
    * `hi+1, hi+2, …` for markers a crash left uncovered — O(1)
    * existence RPCs, no listing. Falls back to a full `_epochs` listing
    * (minus any fold-superseded range) whenever HEAD is absent,
    * unparseable, or contradicts the markers. */
  def committed(s: SparkSession, root: String): Seq[Long] = {
    val d = epochsDir(root)
    val fs = hadoopFs(s, d)
    if (!fs.exists(d)) return Seq.empty
    val fast =
      if (fs.exists(foldPath(root))) None
      else readSmall(fs, headPath(root)).flatMap(parseLongs(_, 2)).flatMap {
        case Seq(lo, hi0) =>
          // a crash between mark() and the HEAD update lags HEAD by a
          // marker or two — probe forward (bounded; past the bound the
          // listing path takes over)
          var hi = hi0
          var probes = 0
          while (probes < 64 && fs.exists(markerPath(root, hi + 1))) {
            hi += 1; probes += 1
          }
          if (probes >= 64 || !fs.exists(markerPath(root, lo)) ||
              !fs.exists(markerPath(root, hi))) None
          else Some(lo to hi)
        case _ => None
      }
    // A compact that started after the FOLD-absence check above could
    // have written FOLD and marked its target while we probed — the
    // probe would then have walked onto the target marker and counted
    // both the folded epochs and their replacement. One extra existence
    // RPC closes that window: if FOLD appeared, the fast range is
    // untrustworthy and the listing path (which subtracts the folded
    // range) is authoritative.
    val safe = fast.filter(_ => !fs.exists(foldPath(root)))
    safe.getOrElse(listCommitted(fs, root))
  }

  /** The listing path: marker files minus any fold-superseded range
    * whose replacement epoch has committed. */
  private def listCommitted(fs: FileSystem, root: String): Seq[Long] = {
    val markers = fs.listStatus(epochsDir(root)).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
    val folded: Set[Long] =
      readSmall(fs, foldPath(root)).flatMap(parseLongs(_, 3)) match {
        // the fold's commit point is its target's marker: once `target`
        // is marked, [lo, hi] is superseded even though the old markers
        // are still being deleted
        case Some(Seq(lo, hi, target)) if markers.contains(target) =>
          (lo to hi).toSet
        case _ => Set.empty
      }
    markers.filterNot(folded).sorted
  }

  /** Maintain `_epochs/HEAD` = `lo hi` after a successful mark. Best
    * effort (a crash here only costs the fast path a probe) and written
    * ONLY while the committed set is a dense range — a gapped set (an
    * out-of-protocol marker) deletes HEAD so readers never trust a
    * range that hides the gap. */
  private def updateHead(fs: FileSystem, root: String, epoch: Long): Unit = {
    readSmall(fs, headPath(root)).flatMap(parseLongs(_, 2)) match {
      case Some(Seq(lo, hi)) if epoch >= lo && epoch <= hi + 1 =>
        if (epoch == hi + 1) writeSmall(fs, headPath(root), s"$lo ${epoch}")
      case _ =>
        val es = listCommitted(fs, root)
        if (es.nonEmpty && es.last - es.head + 1 == es.length)
          writeSmall(fs, headPath(root), s"${es.head} ${es.last}")
        else if (fs.exists(headPath(root))) fs.delete(headPath(root), false)
    }
  }

  /** The commit point: after this returns, `epoch` is visible. When the
    * epoch would GAP the dense range HEAD describes (out-of-protocol),
    * HEAD is deleted BEFORE the marker is created — otherwise a crash
    * between the marker landing and updateHead noticing the gap would
    * leave readers' fast path trusting a range that hides the new
    * marker. */
  def mark(s: SparkSession, root: String, epoch: Long): Unit = {
    val d = epochsDir(root)
    val fs = hadoopFs(s, d)
    fs.mkdirs(d)
    readSmall(fs, headPath(root)).flatMap(parseLongs(_, 2)) match {
      case Some(Seq(lo, hi)) if epoch < lo || epoch > hi + 1 =>
        fs.delete(headPath(root), false)
      case _ => ()
    }
    fs.create(markerPath(root, epoch), true).close()
    updateHead(fs, root, epoch)
  }

  /** Delete torn (data present, marker absent) top-level `epoch=` dirs —
    * crash leftovers. Invisible to readers either way; sweeping keeps a
    * retry from double-writing into the reused epoch number. Returns
    * the epoch numbers swept. */
  def sweepTorn(s: SparkSession, root: String): Seq[Long] = {
    val rootPath = new Path(root)
    val fs = hadoopFs(s, rootPath)
    if (!fs.exists(rootPath)) return Seq.empty
    val live = committed(s, root).toSet
    fs.listStatus(rootPath).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("epoch=")) {
        val e = n.stripPrefix("epoch=")
        if (e.nonEmpty && e.forall(_.isDigit) && !live.contains(e.toLong)) {
          fs.delete(st.getPath, true)
          Some(e.toLong)
        } else None
      } else None
    }.sorted
  }

  /** Sweep, then hand out the next epoch number to write under. Also
    * finishes (or aborts) any fold a crash left in flight — the
    * recovery hook every writer passes through. */
  def nextEpoch(s: SparkSession, root: String): Long = {
    recoverFold(s, root)
    sweepTorn(s, root)
    committed(s, root).lastOption.getOrElse(0L) + 1
  }

  /** Does `epoch`'s commit marker exist? EXECUTOR-SAFE: takes an
    * explicit Hadoop conf (ship the driver's via
    * [[org.apache.spark.sql.graft.Shim.broadcastConf]]) — the marker
    * namespace layout lives HERE, beside mark/committed/sweepTorn,
    * never re-derived by callers. `true` verdicts cache per JVM
    * (bounded LRU; markers are only deleted by [[compact]], which
    * invalidates them and requires a maintenance window); `false`
    * re-checks, because a torn epoch's number is reused by the retry. */
  def markerExists(root: String, epoch: Long,
      conf: org.apache.hadoop.conf.Configuration): Boolean =
    markerCache.get((root, epoch)).isDefined || {
      val p = markerPath(root, epoch)
      val found = p.getFileSystem(conf).exists(p)
      if (found) markerCache.put((root, epoch), java.lang.Boolean.TRUE)
      found
    }

  // bounded: a year-long streaming reader over thousands of epochs must
  // not grow a map entry per (root, epoch) forever
  private val markerCache =
    new LruCache[(String, Long), java.lang.Boolean](65536)

  /** The committed-epoch partition filter, CONSTANT-SIZE in the common
    * case: the protocol keeps committed epochs a dense range, so this
    * is `epoch BETWEEN lo AND hi` — not an IN-list growing one literal
    * per ingest batch into every reader plan. A gapped set (only ever
    * out-of-protocol) falls back to the exact IN-list. */
  def committedPredicate(s: SparkSession, root: String): Column = {
    val es = committed(s, root)
    if (es.isEmpty) lit(false)
    else if (es.last - es.head + 1 == es.length)
      col("epoch").between(es.head, es.last)
    else col("epoch").isin(es: _*)
  }

  /** Restrict an epoch-partitioned frame to COMMITTED epochs and drop
    * the protocol column — the only sanctioned read path. The predicate
    * is a partition filter: pruned from listing metadata, no data
    * cost. A LEGACY layout (no epoch partition — persisted by a
    * pre-protocol build) passes through untouched, mirroring
    * `IncrementalDedup.committedTable`'s guard. */
  def filterCommitted(df: DataFrame, root: String): DataFrame =
    if (!df.columns.contains("epoch")) df
    else df.filter(committedPredicate(df.sparkSession, root)).drop("epoch")

  // ---- supersede semantics (whole-artifact epochs) ------------------

  /** The newest committed epoch — the read point for SUPERSEDE-semantics
    * stores, where each epoch is a COMPLETE artifact replacing its
    * predecessors rather than an increment to union with them (a kNN
    * graph: new nodes change old nodes' top-k, so the refresh unit is
    * the whole edge list). */
  def latest(s: SparkSession, root: String): Option[Long] =
    committed(s, root).lastOption

  /** Restrict an epoch-partitioned frame to the LATEST committed epoch —
    * the supersede-semantics read path ([[filterCommitted]]'s union is
    * wrong there: it would serve every superseded artifact at once).
    * Marking epoch n+1 atomically swaps every reader from n to n+1; a
    * torn refresh (data, no marker) stays invisible. Legacy layouts
    * (no epoch column) pass through untouched. */
  /** Marker-FIRST table constructions. The one-liner
    * `filterLatest(s.read.parquet(root), root)` has a (vanishingly
    * narrow, but real) mid-commit window: `read.parquet` LISTS files
    * before the filter resolves markers, so a listing that catches half
    * an epoch's just-renaming files followed by that epoch's marker
    * landing before marker-resolution would serve a PARTIAL epoch.
    * Resolving the committed set BEFORE the listing closes it: a marked
    * epoch is fully renamed before any listing that can also see its
    * marker (write-then-mark ordering), and an unmarked epoch is
    * filtered out however much of it was listed. Prefer these faces
    * whenever constructing the frame yourself. */
  /** Frame over EXACTLY the given epochs' directories (basePath keeps
    * the partition columns). Confining the listing AND the schema
    * inference to the pinned dirs is the second half of the
    * marker-first story: `read.parquet(root)` reads footers of every
    * listed file at construction time, so even a correctly-pinned read
    * could crash on ANOTHER epoch's file mid-delete (measured by the
    * r16 soak — the failure was in construction, not the scan). */
  private def epochDirsTable(s: SparkSession, root: String,
      es: Seq[Long]): DataFrame =
    s.read.option("basePath", root)
      .parquet(es.map(e => s"$root/epoch=$e"): _*)
      .drop("epoch")

  /** Frame for a root with NO committed epochs: empty for epoch
    * layouts, pass-through for legacy (pre-protocol) layouts. */
  private def uncommittedTable(s: SparkSession, root: String): DataFrame = {
    val df = s.read.parquet(root)
    if (df.columns.contains("epoch")) df.filter(lit(false)).drop("epoch")
    else df
  }

  def latestTable(s: SparkSession, root: String): DataFrame =
    latest(s, root) match { // markers resolved BEFORE any listing
      case Some(e) => epochDirsTable(s, root, Seq(e))
      case None => uncommittedTable(s, root)
    }

  /** [[filterCommitted]] with marker-first construction — see
    * [[latestTable]]. */
  def committedTable(s: SparkSession, root: String): DataFrame = {
    val es = committed(s, root) // before any listing
    if (es.isEmpty) uncommittedTable(s, root)
    else epochDirsTable(s, root, es)
  }

  /** True for the failure shape a maintenance delete leaves under a
    * racing scan: a missing FILE (task-time `FileNotFoundException`,
    * Spark's FAILED_READ_FILE.FILE_NOT_EXIST) or a missing pinned
    * EPOCH directory. A missing path withOUT an `epoch=` segment — a
    * permanently absent root — is NOT the race shape and must
    * propagate immediately instead of burning the retry budget
    * (`AnalysisException: Path does not exist` on the root matched the
    * old broad substring). The cause-chain walk is depth-bounded:
    * wrapped exceptions can be cyclic beyond the self-cause case
    * `getCause` already nulls out. */
  private[ops] def isMissingFileError(t: Throwable): Boolean = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 16) {
      if (cur.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = Option(cur.getMessage).getOrElse("")
      if (m.contains("FILE_NOT_EXIST")) return true
      if ((m.contains("PATH_NOT_FOUND") || m.contains("does not exist")) &&
        m.contains("epoch=")) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** Eager VALIDATING read of the latest artifact — the MVCC reader
    * pattern for maintenance racing reads, pinned by the r16
    * concurrency soak: PIN the live epoch (markers before listing),
    * MATERIALIZE it (localCheckpoint — enforced, not a doc-comment
    * contract: the callback receives a checkpoint-backed frame, so a
    * lazy caller cannot carry an unvalidated file read out of the
    * retry loop), run the caller's read over it, then VERIFY the
    * pinned marker survived. An expire/compact that deleted the pinned epoch
    * mid-read is detected two ways — the scan fails on missing files,
    * or (a listing racing the recursive delete can serve a silent
    * SUBSET) the post-read marker check fails — and either way the
    * read retries against the new live epoch. Exhausting retries
    * fails loudly. The lazy faces ([[latestTable]]/[[filterLatest]])
    * remain correct whenever maintenance holds the documented window
    * or retention covers reader staleness; this face is for readers
    * that must survive UNGRACED maintenance. */
  def latestSnapshot[T](s: SparkSession, root: String, retries: Int = 3)(
      f: DataFrame => T): T = {
    var attempt = 0
    while (attempt <= retries) {
      try {
        val pinned = latest(s, root) // markers BEFORE any listing
        val constructed = pinned match {
          case Some(e) => epochDirsTable(s, root, Seq(e))
          case None => uncommittedTable(s, root)
        }
        // EAGER by construction: the checkpoint is the file-reading
        // action the post-read validation guards, so a caller whose f
        // returns a LAZY frame cannot escape the retry loop with an
        // unvalidated read — whatever f returns is checkpoint-backed,
        // never re-reads the (possibly since-expired) files
        val frame = constructed.localCheckpoint()
        val out = f(frame)
        if (pinned.forall(e => committed(s, root).contains(e))) return out
        // pinned epoch expired mid-read: `out` may be a silent subset
      } catch {
        case t: Throwable if isMissingFileError(t) =>
          if (attempt >= retries) throw new IllegalStateException(
            s"latestSnapshot($root): the pinned epoch kept vanishing under " +
              s"the reader; gave up after ${retries + 1} attempts", t)
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"latestSnapshot($root): the live epoch was superseded and expired " +
        s"under the reader $retries times in a row")
  }

  /** [[latestSnapshot]]'s union-face sibling: pins the committed SET and
    * retries if any pinned epoch's marker vanished mid-read. */
  def committedSnapshot[T](s: SparkSession, root: String, retries: Int = 3)(
      f: DataFrame => T): T = {
    var attempt = 0
    while (attempt <= retries) {
      try {
        val pinnedSet = committed(s, root) // markers BEFORE any listing
        val constructed =
          if (pinnedSet.isEmpty) uncommittedTable(s, root)
          else epochDirsTable(s, root, pinnedSet)
        // eager for the same reason as [[latestSnapshot]]
        val frame = constructed.localCheckpoint()
        val out = f(frame)
        val now = committed(s, root).toSet
        if (pinnedSet.forall(now.contains)) return out
      } catch {
        case t: Throwable if isMissingFileError(t) =>
          if (attempt >= retries) throw new IllegalStateException(
            s"committedSnapshot($root): pinned epochs kept vanishing under " +
              s"the reader; gave up after ${retries + 1} attempts", t)
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"committedSnapshot($root): pinned epochs kept expiring under the " +
        s"reader $retries times in a row")
  }

  def filterLatest(df: DataFrame, root: String): DataFrame =
    if (!df.columns.contains("epoch")) df
    else latest(df.sparkSession, root) match {
      case Some(e) => df.filter(col("epoch") === e).drop("epoch")
      case None => df.filter(lit(false)).drop("epoch")
    }

  /** Expire SUPERSEDED epochs: delete every committed epoch below
    * `keep` — marker first, then data, so a crash in between leaves a
    * torn (unmarked) epoch [[sweepTorn]] reclaims rather than a marked
    * epoch with no data. The survivors stay a dense range, so HEAD is
    * rewritten to it (or dropped if the state is unexpectedly gapped).
    *
    * READER CONTRACT (measured by the r16 concurrency soak, not
    * assumed): deleting VISIBLE epochs races any reader whose plan
    * resolved before the delete — same-JVM included — exactly the
    * snapshot-expiry race of every table format. A racing reader fails
    * LOUDLY (missing-file read error); it never sees silently-wrong
    * rows (a partially-deleted epoch kills the scan, it can't serve a
    * subset). To run expiry under live readers, pass `keep = latest−g`
    * (retention: readers staler than g refresh cycles are out of
    * contract — the [[graft.operators.KnnGraphStore.expire]] `grace`
    * knob). Other JVMs' positive marker-cache entries for expired
    * epochs additionally go stale, as with [[compact]].
    * Returns the epochs removed. */
  def expireBelow(s: SparkSession, root: String, keep: Long): Seq[Long] = {
    val fs = hadoopFs(s, new Path(root))
    if (!fs.exists(epochsDir(root))) return Seq.empty
    val expired = committed(s, root).filter(_ < keep)
    expired.foreach { e =>
      val m = markerPath(root, e)
      if (fs.exists(m)) fs.delete(m, false)
      markerCache.remove((root, e))
      val d = new Path(root, s"epoch=$e")
      if (fs.exists(d)) fs.delete(d, true)
    }
    if (expired.nonEmpty) {
      val remaining = listCommitted(fs, root)
      if (remaining.nonEmpty && remaining.last - remaining.head + 1 == remaining.length)
        writeSmall(fs, headPath(root), s"${remaining.head} ${remaining.last}")
      else if (fs.exists(headPath(root))) fs.delete(headPath(root), false)
    }
    expired
  }

  // ---- fold / compaction -------------------------------------------

  /** Fold every committed epoch into ONE — the maintenance op that
    * keeps `_epochs` and the epoch range small over a year of ingest
    * batches. MAINTENANCE WINDOW REQUIRED: run as the single writer
    * with no concurrent readers in OTHER JVMs (their positive
    * marker-cache entries for the folded epochs go stale; this JVM's
    * are invalidated here). Crash-safe via the `_epochs/FOLD` journal:
    *
    *  1. committed rows are rewritten under the unmarked epoch
    *     `hi + 1` (torn — invisible),
    *  2. FOLD records `lo hi target`,
    *  3. `target`'s marker commits the fold ATOMICALLY — readers'
    *     listing path drops `[lo, hi]` the moment `target` is marked,
    *  4. cleanup deletes the old markers and data dirs, rewrites HEAD,
    *     and removes FOLD (each step idempotent — [[recoverFold]]
    *     re-runs it after a crash).
    *
    * `writeEpoch(rows, target)` must write `rows` under
    * `root/epoch=<target>` in the layout's own format (bucketed
    * catalogs pass their bucketed writer; plain parquet layouts can use
    * [[compactParquet]]). Returns the target epoch, or None when there
    * is at most one committed epoch (nothing to fold). */
  def compact(s: SparkSession, root: String,
      readCommitted: () => DataFrame,
      writeEpoch: (DataFrame, Long) => Unit): Option[Long] = {
    recoverFold(s, root)
    sweepTorn(s, root)
    val es = committed(s, root)
    if (es.length <= 1) return None
    require(es.last - es.head + 1 == es.length,
      s"gapped committed set ${es.mkString(",")} — fold requires the dense " +
        "range the protocol maintains")
    val (lo, hi) = (es.head, es.last)
    val target = hi + 1
    writeEpoch(readCommitted(), target)
    val fs = hadoopFs(s, new Path(root))
    writeSmall(fs, foldPath(root), s"$lo $hi $target")
    mark(s, root, target) // the fold's atomic commit point
    finishFold(s, fs, root, lo, hi, target)
    Some(target)
  }

  /** Convenience writer for PLAIN parquet epoch layouts (no bucketing):
    * lands `rows` as `root/epoch=<target>/…`. */
  def compactParquet(root: String)(rows: DataFrame, target: Long): Unit =
    rows.withColumn("epoch", lit(target))
      .write.mode("append").partitionBy("epoch").parquet(root)

  /** Finish or abort a fold a crash left in flight. Target marked →
    * the fold committed: re-run the (idempotent) cleanup. Target
    * unmarked → it never happened: drop the staged data and the
    * journal. */
  def recoverFold(s: SparkSession, root: String): Unit = {
    val fs = hadoopFs(s, new Path(root))
    readSmall(fs, foldPath(root)).flatMap(parseLongs(_, 3)) match {
      case Some(Seq(lo, hi, target)) =>
        if (fs.exists(markerPath(root, target)))
          finishFold(s, fs, root, lo, hi, target)
        else {
          val staged = new Path(root, s"epoch=$target")
          if (fs.exists(staged)) fs.delete(staged, true)
          fs.delete(foldPath(root), false)
        }
      case _ => ()
    }
  }

  private def finishFold(s: SparkSession, fs: FileSystem, root: String,
      lo: Long, hi: Long, target: Long): Unit = {
    (lo to hi).foreach { e =>
      val m = markerPath(root, e)
      if (fs.exists(m)) fs.delete(m, false)
      markerCache.remove((root, e))
      val d = new Path(root, s"epoch=$e")
      if (fs.exists(d)) fs.delete(d, true)
    }
    writeSmall(fs, headPath(root), s"$target $target")
    fs.delete(foldPath(root), false)
  }

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
