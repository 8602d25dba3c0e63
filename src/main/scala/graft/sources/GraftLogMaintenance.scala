package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * SEGMENT COMPACTION for the graftlog layout — the small-files
 * maintenance a years-long producer needs: every append lands one
 * segment file per partition per batch, so a year of micro-batches
 * leaves thousands of tiny segments whose footer sweeps
 * ([[GraftLog.latestOffsets]], envelope pruning) and per-task open
 * costs grow linearly. Compaction rewrites a partition's segments into
 * ONE file with identical rows and offsets — positions, bounded
 * replays, and the idempotent-producer bases are all unchanged by
 * construction.
 *
 * MAINTENANCE WINDOW REQUIRED: no concurrent producer (it would append
 * a segment the journal doesn't cover) and no concurrent readers (the
 * swap window is not atomic for them; the same stance as
 * [[graft.ops.EpochCommit.compact]] and any file-layout compaction).
 * Within the window, a CRASH at any step is recoverable via the
 * `_staging/compact/JOURNAL` record:
 *
 *  1. the merged segment is written under `_staging/compact/`
 *     (underscore-invisible to every reader),
 *  2. the journal records (partition, staged file, old files),
 *  3. old segments are deleted,
 *  4. the staged segment renames into the partition directory,
 *  5. the journal is removed.
 *
 * [[recover]] — called automatically at the start of every
 * [[compactSegments]] — finishes a crash after step 2 (staged data is
 * complete: delete remaining olds, rename) or aborts a crash before it
 * (journal absent: sweep the invisible staging dir). The only
 * unrecoverable shape — journal present, staged file missing, old
 * files partially deleted — cannot arise from this ordering and fails
 * loudly rather than guessing.
 */
object GraftLogMaintenance {

  private def stagingDir(dir: String) = new Path(dir, "_staging/compact")
  private def journalPath(dir: String) = new Path(stagingDir(dir), "JOURNAL")

  // ---- the maintenance SEQLOCK (r17) ---------------------------------
  // The compaction swap and TRUNCATE delete visible segment files, so a
  // reader whose LISTING lands inside the window can assemble a silent
  // SUBSET (olds gone, merged not yet renamed in) — the exact failure
  // class the r16 epoch soak measured for EpochCommit, re-found here by
  // the catalog soak. Markers can't fix it (segments have none), so the
  // log carries a classic seqlock at `_maint/SEQ`: every maintenance op
  // that mutates VISIBLE files holds it odd for the duration; reader
  // listings ([[GraftLog.validatedListing]]) re-read it after listing
  // and retry/fail LOUDLY on odd-or-changed. A crash mid-maintenance
  // leaves the seq odd — readers stay loud (never silently wrong) until
  // `recover_compaction` settles the state and evens it. `_maint` is
  // deliberately outside `_staging` so TRUNCATE (which deletes staging)
  // keeps the counter monotone across incarnations.

  private def seqPath(dir: String) = new Path(dir, "_maint/SEQ")

  private[sources] def maintenanceSeq(fs: FileSystem, dir: String): Long =
    GraftLog.readSmall(fs, seqPath(dir))
      .flatMap(_.trim.toLongOption).getOrElse(0L)

  private def writeSeq(fs: FileSystem, dir: String, v: Long): Unit = {
    val tmp = new Path(dir, s"_maint/SEQ.tmp")
    GraftLog.writeSmall(fs, tmp, v.toString)
    fs.delete(seqPath(dir), false)
    require(fs.rename(tmp, seqPath(dir)),
      s"failed to publish maintenance seq $v under $dir")
  }

  /** Mark maintenance in progress (seq → odd). Idempotent: an already-
    * odd seq (a crashed or enclosing maintenance) is kept, so recovery
    * and truncate re-runs can proceed. */
  private[sources] def beginMaintenance(fs: FileSystem, dir: String): Unit = {
    val n = maintenanceSeq(fs, dir)
    if (n % 2 == 0) writeSeq(fs, dir, n + 1)
  }

  /** Mark maintenance settled (seq → even). */
  private[sources] def endMaintenance(fs: FileSystem, dir: String): Unit = {
    val n = maintenanceSeq(fs, dir)
    if (n % 2 == 1) writeSeq(fs, dir, n + 1)
  }

  // ---- the TRUNCATE incarnation stamp (r20, r19 advice medium) -------
  // The r19 offset-regression guards fire only while the new
  // incarnation is still SHORTER than the checkpointed watermark — a
  // stream stopped across a TRUNCATE whose replacement grows past the
  // committed offsets before the restart would resume silently and
  // deliver mixed incarnations. The stamp closes the timing hole:
  // TRUNCATE bumps a counter at `_maint/INC` (outside `_staging` and
  // the partition dirs, so the bump itself survives the deletes), every
  // streaming offset carries the incarnation it was committed under,
  // and admission/planning fail HARD on any mismatch — independent of
  // relative offsets, and deliberately not demotable by failOnDataLoss
  // (the new incarnation reuses the old offset space; no consistent
  // redelivery exists under the stale checkpoint).

  private def incPath(dir: String) = new Path(dir, "_maint/INC")

  private[sources] def incarnation(fs: FileSystem, dir: String): Long =
    GraftLog.readSmall(fs, incPath(dir))
      .flatMap(_.trim.toLongOption).getOrElse(0L)

  private[sources] def bumpIncarnation(fs: FileSystem, dir: String): Unit = {
    val tmp = new Path(dir, "_maint/INC.tmp")
    GraftLog.writeSmall(fs, tmp, (incarnation(fs, dir) + 1).toString)
    fs.delete(incPath(dir), false)
    require(fs.rename(tmp, incPath(dir)),
      s"failed to publish log incarnation under $dir")
  }

  /** Compact every partition with more than `minFiles` segments down to
    * one. Returns (partition → segments merged) for the partitions
    * touched. */
  def compactSegments(spark: SparkSession, dir: String,
      minFiles: Int = 2): Map[Int, Int] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    recover(spark, dir)
    if (fs.exists(stagingDir(dir))) { fs.delete(stagingDir(dir), true); () }

    val work = GraftLog.partitionDirs(dir, conf).toSeq.sortBy(_._1).flatMap {
      case (p, pdir) =>
        val files = GraftLog.partFiles(fs, pdir)
        if (files.size < minFiles) None else Some((p, files))
    }
    if (work.isEmpty) return Map.empty
    // seqlock held odd across every visible mutation; a crash leaves it
    // odd (readers loud) until recover() settles the state
    beginMaintenance(fs, dir)
    val merged = work.map { case (p, files) =>
      compactOne(spark, dir, fs, conf, p, files)
      p -> files.size
    }.toMap
    GraftLogWrite.cleanupStaging(stagingDir(dir).toString, conf)
    endMaintenance(fs, dir)
    merged
  }

  private def compactOne(spark: SparkSession, dir: String, fs: FileSystem,
      conf: Configuration, p: Int, files: Seq[Path]): Unit = {
    // 1. merged segment, offset-sorted so row-group stats stay tight
    val tmp = new Path(stagingDir(dir), s"build-p$p")
    spark.read.parquet(files.map(_.toString): _*)
      .select("offset", "key", "value")
      .coalesce(1).sortWithinPartitions("offset")
      .write.mode("overwrite").parquet(tmp.toString)
    val built = fs.listStatus(tmp).map(_.getPath)
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .getOrElse(throw new IllegalStateException(s"no staged segment under $tmp"))
    val staged = new Path(stagingDir(dir),
      s"compacted-p$p-${java.util.UUID.randomUUID()}.parquet")
    require(fs.rename(built, staged), s"failed to stage $built")
    fs.delete(tmp, true)

    // 2. the journal — the point of no return for THIS partition.
    // Written to a temp name and renamed into place so a crash mid-write
    // never leaves a partial file AT the journal path; the trailing END
    // sentinel covers filesystems whose rename is copy+delete — recover
    // treats a journal without it as a pre-step-2 crash and aborts
    // (staged and old files are both still intact at that point).
    val journal = (Seq(p.toString, staged.toString) ++ files.map(_.toString) ++
      Seq("END")).mkString("\n")
    val jtmp = new Path(stagingDir(dir), s"JOURNAL.tmp-p$p")
    GraftLog.writeSmall(fs, jtmp, journal)
    require(fs.rename(jtmp, journalPath(dir)),
      s"failed to publish compaction journal for partition $p")

    finishSwap(fs, dir, p, staged, files)
  }

  /** Steps 3-5: idempotent — recovery re-runs it verbatim. */
  private def finishSwap(fs: FileSystem, dir: String, p: Int,
      staged: Path, oldFiles: Seq[Path]): Unit = {
    oldFiles.foreach { f => if (fs.exists(f)) fs.delete(f, false) }
    val dest = new Path(dir, s"partition=$p/${staged.getName}")
    if (fs.exists(staged)) {
      fs.mkdirs(dest.getParent)
      require(fs.rename(staged, dest), s"failed to promote $staged to $dest")
    } else require(fs.exists(dest),
      s"compaction lost the merged segment: neither $staged nor $dest exists")
    fs.delete(journalPath(dir), false)
    ()
  }

  /** Finish or abort a compaction a crash left in flight, then settle
    * the maintenance seqlock (readers go loud while it is odd; an
    * unrecoverable state throws and LEAVES it odd — the log stays
    * loudly unreadable rather than silently wrong). */
  def recover(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val jp = journalPath(dir)
    val hasJournal = fs.exists(jp)
    if (!hasJournal) {
      // crashed before the journal (or a failed TRUNCATE re-run already
      // cleaned up): no visible swap can be in flight — settle the lock
      endMaintenance(fs, dir)
      return
    }
    beginMaintenance(fs, dir)
    recoverJournal(spark, fs, dir, jp)
    endMaintenance(fs, dir)
  }

  private def recoverJournal(spark: SparkSession, fs: FileSystem,
      dir: String, jp: Path): Unit = {
    GraftLog.readSmall(fs, jp) match {
      case Some(txt) =>
        val all = txt.split("\n").toSeq
        if (all.isEmpty || all.last != "END") {
          // No END sentinel. Two possible writers: (a) this format,
          // crashed mid-write (only reachable on a copy+delete rename
          // filesystem — the temp+rename publish keeps partials off this
          // path otherwise), where nothing has been deleted and abort is
          // safe; (b) the pre-sentinel journal format, which is COMPLETE
          // without END and may have already run part of finishSwap —
          // aborting that one would sweep the staged segment while some
          // old segments are already deleted, losing the partition.
          // Disambiguate by state: if the journal parses and its merged
          // segment still exists (staged or already promoted), finishing
          // is the only safe action; if the merged segment is gone but
          // every old segment survives, nothing was swapped — abort; any
          // other state is unrecognizable and must fail loudly rather
          // than silently delete the journal.
          val lines = all.filter(_.nonEmpty)
          val legacyParses =
            lines.length >= 2 && lines.head.nonEmpty && lines.head.forall(_.isDigit)
          if (legacyParses) {
            val p = lines.head.toInt
            val staged = new Path(lines(1))
            val dest = new Path(dir, s"partition=$p/${staged.getName}")
            val olds = lines.drop(2).map(new Path(_))
            if (fs.exists(staged) || fs.exists(dest)) {
              // Before trusting a sentinel-less journal's olds list,
              // prove it is COMPLETE: a genuine legacy journal always
              // lists every part file of partition p (compactOne passes
              // all of them), while a current-format journal truncated
              // mid-publish (crash during a copy+delete rename) parses
              // identically but with olds cut short. Finishing the
              // truncated one would promote the merged segment (all
              // rows) while the unlisted old segments survive —
              // duplicating every unlisted row with no trace. Any live
              // part file of partition p that is neither the dest name
              // nor in olds proves truncation.
              val pdir = new Path(dir, s"partition=$p")
              val listed = olds.map(_.getName).toSet + dest.getName
              val extras =
                if (fs.exists(pdir))
                  GraftLog.partFiles(fs, pdir).map(_.getName)
                    .filterNot(listed.contains)
                else Seq.empty
              if (extras.isEmpty) {
                finishSwap(fs, dir, p, staged, olds)
                return
              }
              if (fs.exists(staged)) {
                // Truncation happened mid-journal-publish, BEFORE
                // finishSwap: staging precedes the journal and nothing
                // has been deleted yet, so aborting is safe — drop the
                // journal; the staging sweep reclaims the merged file.
                fs.delete(jp, false)
                return
              }
              throw new IllegalStateException(
                s"unrecognized compaction journal at $jp (no END " +
                  s"sentinel; partition $p has part files not listed as " +
                  s"olds: ${extras.mkString(", ")}; merged segment " +
                  "already promoted) — refusing to auto-recover " +
                  s"partition $p under $dir")
            }
            if (olds.forall(fs.exists)) { fs.delete(jp, false); return }
            throw new IllegalStateException(
              s"unrecognized compaction journal at $jp (no END sentinel, " +
                s"merged segment missing, old segments partially deleted) — " +
                s"refusing to auto-recover partition $p under $dir")
          }
          // Does not parse as any journal format: a mid-write partial;
          // staged and old files are both intact, so abort — drop the
          // journal and let the staging sweep reclaim the staged segment.
          fs.delete(jp, false)
          return
        }
        val lines = all.dropRight(1)
        require(lines.length >= 2 && lines.head.forall(_.isDigit),
          s"corrupt compaction journal at $jp: ${txt.take(200)}")
        val p = lines.head.toInt
        val staged = new Path(lines(1))
        val olds = lines.drop(2).map(new Path(_))
        val dest = new Path(dir, s"partition=$p/${staged.getName}")
        if (fs.exists(staged) || fs.exists(dest))
          finishSwap(fs, dir, p, staged, olds) // journal complete: finish
        else if (olds.forall(fs.exists)) { // staged gone, olds intact: abort
          fs.delete(jp, false)
          ()
        } else throw new IllegalStateException(
          s"unrecoverable compaction state for partition $p under $dir: " +
            "merged segment missing and old segments partially deleted")
      case None => ()
    }
  }
}
