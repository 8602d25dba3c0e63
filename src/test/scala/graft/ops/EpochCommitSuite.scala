package graft.ops

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The epoch commit protocol's scale and crash contracts: HEAD keeps
  * `committed()` listing-free and the reader predicate a constant-size
  * range however many ingest batches have run; the FOLD journal makes
  * compaction atomic — a crash at any step aborts or completes, never
  * double-counts or loses rows. */
class EpochCommitSuite extends SparkSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("epochs").toString

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def markerNames(root: String): Seq[String] =
    fs(root).listStatus(new Path(root, "_epochs")).toSeq
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).sorted

  private def readHead(root: String): Option[String] = {
    val p = new Path(root, "_epochs/HEAD")
    val f = fs(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(0, n), "UTF-8").trim)
      } finally in.close()
    }
  }

  private def writeControl(root: String, name: String, content: String): Unit = {
    val f = fs(root)
    f.mkdirs(new Path(root, "_epochs"))
    val out = f.create(new Path(root, s"_epochs/$name"), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Seed `root` with plain-parquet epochs 1..n, each committed,
    * carrying (epoch, id) rows. */
  private def seed(root: String, n: Int, rowsPerEpoch: Int = 4): Unit = {
    (1 to n).foreach { e =>
      spark.range(rowsPerEpoch)
        .select(lit(e.toLong).as("epoch"),
          (col("id") + e * 1000L).as("id"))
        .write.mode("append").partitionBy("epoch").parquet(root)
      EpochCommit.mark(spark, root, e.toLong)
    }
  }

  test("marker-first tables list ONLY the pinned epochs' directories") {
    // the r16 soak lesson: read.parquet(root) reads footers of every
    // listed file at CONSTRUCTION, so a face that lists superseded
    // epochs is exposed to their deletion even when its filter is
    // correct — the fix is a listing scoped to the pinned dirs
    val root = tmp()
    seed(root, 3)
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      flattenPlan(df.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
    val latestPaths = scanPaths(EpochCommit.latestTable(spark, root))
    assert(latestPaths.forall(_.endsWith("epoch=3")) && latestPaths.nonEmpty,
      s"latestTable listed beyond the pinned epoch: $latestPaths")
    val unionPaths = scanPaths(EpochCommit.committedTable(spark, root))
    assert(unionPaths.map(_.split("epoch=").last).sorted == Seq("1", "2", "3"),
      s"committedTable must list exactly the committed epochs: $unionPaths")
    // contents match the lazy faces
    assert(EpochCommit.latestTable(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet === (3000L until 3004L).toSet)
    assert(EpochCommit.committedTable(spark, root).count() === 12)
  }

  test("latestSnapshot retries when its pinned epoch is expired mid-read") {
    val root = tmp()
    seed(root, 2)
    var calls = 0
    val got = EpochCommit.latestSnapshot(spark, root) { frame =>
      calls += 1
      val out = frame.select("id").collect().map(_.getLong(0)).toSet
      if (calls == 1) {
        // a maintenance cycle lands ENTIRELY inside the read: epoch 3
        // commits and everything below it expires — the pinned epoch 2
        // is gone, so `out` must be treated as suspect and retried
        spark.range(4).select(lit(3L).as("epoch"), (col("id") + 3000L).as("id"))
          .write.mode("append").partitionBy("epoch").parquet(root)
        EpochCommit.mark(spark, root, 3L)
        EpochCommit.expireBelow(spark, root, 3L)
      }
      out
    }
    assert(calls === 2, s"validation must force exactly one retry, saw $calls")
    assert(got === (3000L until 3004L).toSet,
      s"the retry must serve the NEW latest epoch, got $got")
  }

  test("snapshot faces: a lazy callback cannot escape the MVCC guarantee") {
    // f returns the frame UNmaterialized-by-the-caller; the face must
    // have materialized it anyway (localCheckpoint), so collecting the
    // result AFTER maintenance deleted every file still serves the
    // pinned rows instead of failing or reading the new epoch
    val root = tmp()
    seed(root, 2)
    val lazyFrame = EpochCommit.latestSnapshot(spark, root)(df => df.select("id"))
    spark.range(4).select(lit(3L).as("epoch"), (col("id") + 3000L).as("id"))
      .write.mode("append").partitionBy("epoch").parquet(root)
    EpochCommit.mark(spark, root, 3L)
    EpochCommit.expireBelow(spark, root, 3L)
    assert(lazyFrame.collect().map(_.getLong(0)).toSet === (2000L until 2004L).toSet,
      "the returned frame must be checkpoint-backed, not a live file read")
  }

  test("snapshot faces: a persistent missing-file error on the last attempt is wrapped loudly") {
    val root = tmp()
    seed(root, 2)
    // marker survives but the data directory is gone on EVERY attempt —
    // the final retry must surface the contextual IllegalStateException,
    // not the raw scan error
    fs(root).delete(new Path(root, "epoch=2"), true)
    val e = intercept[IllegalStateException] {
      EpochCommit.latestSnapshot(spark, root, retries = 1)(_.count())
    }
    assert(e.getMessage.contains(root) && e.getMessage.contains("2 attempts"),
      e.getMessage)
    assert(e.getCause != null, "the raw scan error must ride along as the cause")
  }

  test("isMissingFileError: epoch-scoped races retry, a missing ROOT does not") {
    assert(EpochCommit.isMissingFileError(new java.io.FileNotFoundException("f")))
    assert(EpochCommit.isMissingFileError(
      new RuntimeException("[PATH_NOT_FOUND] Path does not exist: /x/epoch=3")))
    assert(!EpochCommit.isMissingFileError(
      new RuntimeException("[PATH_NOT_FOUND] Path does not exist: /gone/root")),
      "a permanently missing root is not the expiry race")
    assert(EpochCommit.isMissingFileError(new RuntimeException("outer",
      new java.io.FileNotFoundException("inner"))))
    // depth-bounded cause walk terminates on a cycle
    val a = new RuntimeException("a")
    val b = new RuntimeException("b", a)
    a.initCause(b)
    assert(!EpochCommit.isMissingFileError(b))
  }

  test("committedSnapshot fails loudly when pinned epochs keep expiring") {
    val root = tmp()
    seed(root, 2)
    var next = 3L
    val e = intercept[IllegalStateException] {
      EpochCommit.committedSnapshot(spark, root, retries = 1) { frame =>
        frame.count() // eager read, then invalidate the pinned set
        spark.range(1).select(lit(next).as("epoch"), (col("id") + next * 1000L).as("id"))
          .write.mode("append").partitionBy("epoch").parquet(root)
        EpochCommit.mark(spark, root, next)
        EpochCommit.expireBelow(spark, root, next)
        next += 1
      }
    }
    assert(e.getMessage.contains("kept expiring"), e.toString)
  }

  test("predicate stays a constant-size range across 1000 epochs; HEAD makes committed listing-free") {
    val root = tmp()
    (1 to 1000).foreach(e => EpochCommit.mark(spark, root, e.toLong))
    assert(EpochCommit.committed(spark, root) === (1L to 1000L))
    assert(readHead(root) === Some("1 1000"))

    val pred = EpochCommit.committedPredicate(spark, root)
    val s = pred.toString
    assert(s.length < 200, s"predicate grew with epoch count: ${s.take(300)}")
    assert(!s.contains("in("), s)

    // a reader plan over a 1000-epoch layout stays constant-size too
    val dataRoot = tmp()
    seed(dataRoot, 3)
    (4 to 1000).foreach(e => EpochCommit.mark(spark, dataRoot, e.toLong))
    val view = EpochCommit.filterCommitted(
      spark.read.parquet(dataRoot), dataRoot)
    assert(view.count() === 12)
    val plan = view.queryExecution.optimizedPlan.toString
    assert(plan.length < 4000, s"plan grew with epoch count (${plan.length} chars)")

    // HEAD lagging a crash-window of markers: probes catch up
    writeControl(root, "HEAD", "1 997")
    assert(EpochCommit.committed(spark, root) === (1L to 1000L))
    // corrupt HEAD: falls back to the listing, still correct
    writeControl(root, "HEAD", "not numbers")
    assert(EpochCommit.committed(spark, root) === (1L to 1000L))
  }

  test("a gapped (out-of-protocol) marker set drops HEAD and falls back to the exact IN-list") {
    val root = tmp()
    EpochCommit.mark(spark, root, 1L)
    EpochCommit.mark(spark, root, 3L) // skips 2 — mark() refuses to range over the gap
    assert(readHead(root) === None)
    assert(EpochCommit.committed(spark, root) === Seq(1L, 3L))
    assert(EpochCommit.committedPredicate(spark, root).toString.contains("in("))
  }

  test("compact folds all committed epochs into one; rows, positions, and controls all land") {
    val root = tmp()
    seed(root, 5)
    val before = spark.read.parquet(root).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

    val target = EpochCommit.compact(spark, root,
      () => EpochCommit.filterCommitted(spark.read.parquet(root), root),
      EpochCommit.compactParquet(root))
    assert(target === Some(6L))

    assert(EpochCommit.committed(spark, root) === Seq(6L))
    assert(markerNames(root) === Seq("6"))
    assert(readHead(root) === Some("6 6"))
    assert(!fs(root).exists(new Path(root, "_epochs/FOLD")))
    (1 to 5).foreach(e =>
      assert(!fs(root).exists(new Path(root, s"epoch=$e")), s"epoch=$e survived"))

    val after = EpochCommit.filterCommitted(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before)

    // the writer keeps appending past the fold; range stays dense
    assert(EpochCommit.nextEpoch(spark, root) === 7L)
    spark.range(2).select(lit(7L).as("epoch"), (col("id") + 7000L).as("id"))
      .write.mode("append").partitionBy("epoch").parquet(root)
    EpochCommit.mark(spark, root, 7L)
    assert(EpochCommit.committed(spark, root) === Seq(6L, 7L))
    assert(EpochCommit.committedPredicate(spark, root).toString.contains("and("))
  }

  test("fold crash before the target marker aborts cleanly — staged data dropped, old view intact") {
    val root = tmp()
    seed(root, 5)
    val before = EpochCommit.filterCommitted(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

    // replay compact's steps 1-2 and crash before the mark
    EpochCommit.compactParquet(root)(
      EpochCommit.filterCommitted(spark.read.parquet(root), root), 6L)
    writeControl(root, "FOLD", "1 5 6")

    // readers NEVER see the staged epoch (target unmarked)
    assert(EpochCommit.committed(spark, root) === (1L to 5L))
    val during = EpochCommit.filterCommitted(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(during === before)

    // the next writer pass aborts the fold
    assert(EpochCommit.nextEpoch(spark, root) === 6L)
    assert(!fs(root).exists(new Path(root, "epoch=6")), "staged fold data survived")
    assert(!fs(root).exists(new Path(root, "_epochs/FOLD")))
    assert(EpochCommit.committed(spark, root) === (1L to 5L))
  }

  test("fold crash after the target marker completes on recovery — no double count, no loss") {
    val root = tmp()
    seed(root, 5)
    val before = EpochCommit.filterCommitted(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

    // replay compact's steps 1-3 and crash before cleanup
    EpochCommit.compactParquet(root)(
      EpochCommit.filterCommitted(spark.read.parquet(root), root), 6L)
    writeControl(root, "FOLD", "1 5 6")
    EpochCommit.mark(spark, root, 6L)

    // the fold committed the instant the target marked: the superseded
    // range is excluded even though its markers still exist
    assert(EpochCommit.committed(spark, root) === Seq(6L))
    val during = EpochCommit.filterCommitted(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(during === before, "fold double-counted or lost rows mid-cleanup")

    EpochCommit.recoverFold(spark, root)
    assert(markerNames(root) === Seq("6"))
    assert(readHead(root) === Some("6 6"))
    assert(!fs(root).exists(new Path(root, "_epochs/FOLD")))
    val after = EpochCommit.filterCommitted(spark.read.parquet(root), root)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before)
  }

  test("supersede lifecycle crash sweep: every crash point serves one whole artifact; a new writer always recovers") {
    // The refresh protocol is a step script: write epoch 1 (torn), mark
    // 1, write epoch 2, mark 2, then expiry's internal order (marker
    // delete, data delete). A crash = stopping after step k. For EVERY
    // prefix the latest-committed view must be one COMPLETE artifact —
    // the newest MARKED epoch's rows exactly, never a mix, never a torn
    // epoch — and a recovering writer (nextEpoch → write → mark) must
    // land a clean next epoch with the torn debris swept.
    def writeData(root: String, e: Long): Unit =
      spark.range(5)
        .select(lit(e).as("epoch"), (col("id") + e * 100L).as("id"))
        .write.mode("append").partitionBy("epoch").parquet(root)
    def view(root: String): Set[Long] = {
      val hasData = fs(root).listStatus(new Path(root))
        .exists(_.getPath.getName.startsWith("epoch="))
      if (!hasData) Set.empty // nothing written yet: no schema to infer
      else EpochCommit.filterLatest(spark.read.parquet(root), root)
        .select("id").collect().map(_.getLong(0)).toSet
    }
    def artifact(e: Long): Set[Long] = (0L until 5L).map(_ + e * 100L).toSet

    val steps: Seq[(String, String => Unit, Option[Long])] = Seq(
      ("write e1", root => writeData(root, 1L), None),
      ("mark e1", root => EpochCommit.mark(spark, root, 1L), Some(1L)),
      ("write e2", root => writeData(root, 2L), Some(1L)),
      ("mark e2", root => EpochCommit.mark(spark, root, 2L), Some(2L)),
      ("expire: marker1 gone", root =>
        { fs(root).delete(new Path(root, "_epochs/1"), false); () }, Some(2L)),
      ("expire: data1 gone", root =>
        { fs(root).delete(new Path(root, "epoch=1"), true); () }, Some(2L)),
      ("expire: complete", root =>
        { EpochCommit.expireBelow(spark, root, 2L); () }, Some(2L)))

    for (k <- 0 to steps.length) {
      val root = tmp()
      steps.take(k).foreach { case (_, step, _) => step(root) }
      val expected = steps.take(k).flatMap(_._3).lastOption
      val at = s"crash after ${if (k == 0) "nothing" else steps(k - 1)._1}"
      assert(view(root) === expected.map(artifact).getOrElse(Set.empty),
        s"$at: view is not the newest whole artifact")

      // writer recovery: the next refresh sweeps debris and swaps clean
      val e = EpochCommit.nextEpoch(spark, root)
      assert(expected.forall(_ < e), s"$at: nextEpoch $e reused a committed epoch")
      writeData(root, e)
      EpochCommit.mark(spark, root, e)
      assert(view(root) === artifact(e), s"$at: recovery epoch $e not served")
      // on-disk epoch dirs are only committed ones (torn debris swept by
      // nextEpoch; superseded ones may legitimately remain until expiry)
      val dirs = fs(root).listStatus(new Path(root)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("epoch="))
        .map(_.stripPrefix("epoch=").toLong).toSet
      val committed = EpochCommit.committed(spark, root).toSet
      assert(dirs.subsetOf(committed),
        s"$at: torn debris survived recovery: dirs=$dirs committed=$committed")
    }
  }
}
