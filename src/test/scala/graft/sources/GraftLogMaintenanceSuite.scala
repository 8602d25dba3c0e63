package graft.sources

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Segment compaction: many appended segments collapse to one per
  * partition with rows, offsets, positions, and connector reads all
  * unchanged; a crash at either side of the journal recovers. */
class GraftLogMaintenanceSuite extends SparkSuite {

  private def conf() = spark.sessionState.newHadoopConf()

  /** A log grown through 5 producer batches per partition — 5 segment
    * files each. */
  private def grownLog(): String = {
    val dir = Files.createTempDirectory("graftlog-compact").toString
    GraftLog.materialize(
      spark.range(0, 20)
        .selectExpr("cast(id % 2 as int) as partition", "id div 2 as offset",
          "cast(id as string) as key", "concat('v', id) as value"),
      dir)
    (1 to 4).foreach { i =>
      GraftLog.append(spark.range(i * 100, i * 100 + 8)
        .selectExpr("cast(id % 2 as int) as partition",
          "concat('k', id) as key", "concat('v', id) as value"), dir)
    }
    dir
  }

  private def segFiles(dir: String, p: Int): Seq[String] =
    GraftLog.partFiles(new Path(dir).getFileSystem(conf()),
      new Path(dir, s"partition=$p")).map(_.toString)

  private def rows(dir: String): Seq[(Int, Long, String, String)] =
    spark.read.format("graftlog").option("path", dir).load()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("compaction collapses segments to one per partition; rows and positions unchanged") {
    val dir = grownLog()
    val (n0, n1) = (segFiles(dir, 0).size, segFiles(dir, 1).size)
    assert(n0 >= 5 && n1 >= 5, s"fixture must be many-segment: $n0/$n1")
    val before = rows(dir)
    val positions = GraftLog.latestOffsets(dir, conf())

    val merged = GraftLogMaintenance.compactSegments(spark, dir)
    assert(merged === Map(0 -> n0, 1 -> n1))
    assert(segFiles(dir, 0).size === 1 && segFiles(dir, 1).size === 1)
    assert(rows(dir) === before, "compaction changed the log contents")
    assert(GraftLog.latestOffsets(dir, conf()) === positions)
    assert(!new java.io.File(s"$dir/_staging").exists(), "staging not swept")

    // idempotent: nothing left to merge
    assert(GraftLogMaintenance.compactSegments(spark, dir) === Map.empty)
    // and the producer keeps appending after the fold
    GraftLog.append(spark.range(0, 4)
      .selectExpr("cast(id % 2 as int) as partition",
        "concat('z', id) as key", "concat('z', id) as value"), dir)
    assert(rows(dir).size === before.size + 4)
  }

  test("crash AFTER the journal (olds partially deleted) completes on recovery") {
    val dir = grownLog()
    val before = rows(dir)
    val fs = new Path(dir).getFileSystem(conf())
    // replay compactOne's steps for partition 0 and crash mid-step-3
    val olds = segFiles(dir, 0)
    val staged = new Path(dir, "_staging/compact/compacted-p0-crash.parquet")
    spark.read.parquet(olds: _*).select("offset", "key", "value")
      .coalesce(1).sortWithinPartitions("offset")
      .write.parquet(s"$dir/_staging/compact/build")
    val built = fs.listStatus(new Path(s"$dir/_staging/compact/build"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(built, staged))
    GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
      (Seq("0", staged.toString) ++ olds ++ Seq("END")).mkString("\n"))
    fs.delete(new Path(olds.head), false) // the tear: one old gone, no rename

    GraftLogMaintenance.recover(spark, dir)
    assert(segFiles(dir, 0).size === 1, "recovery did not finish the swap")
    assert(rows(dir) === before, "recovery lost or duplicated rows")
    assert(!fs.exists(new Path(dir, "_staging/compact/JOURNAL")))
  }

  test("crash MID-journal-write (no END sentinel) aborts; compaction still runs") {
    // r13-advice defect: a partial journal used to fail recover()'s
    // corrupt-journal require forever, wedging every future compaction.
    // A journal without the END sentinel means step 3 never started —
    // staged and old files are both intact — so recover aborts it.
    val dir = grownLog()
    val before = rows(dir)
    val fs = new Path(dir).getFileSystem(conf())
    val (n0, n1) = (segFiles(dir, 0).size, segFiles(dir, 1).size)
    GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
      "0\n/some/partial/path") // torn mid-write: record truncated, no END
    GraftLogMaintenance.recover(spark, dir)
    assert(!fs.exists(new Path(dir, "_staging/compact/JOURNAL")),
      "partial journal not aborted")
    assert(rows(dir) === before)
    // and the wedge is gone: a full compaction now succeeds
    val merged = GraftLogMaintenance.compactSegments(spark, dir)
    assert(merged === Map(0 -> n0, 1 -> n1))
    assert(rows(dir) === before)
  }

  test("legacy no-END journal mid-finishSwap completes instead of aborting") {
    // r14-advice defect: the END-sentinel check classified EVERY
    // sentinel-less journal as a pre-step-2 crash and deleted it — but a
    // journal written by the pre-sentinel format is complete without END
    // and may already have deleted old segments; aborting it swept the
    // staged merge and lost the partition. With the merged segment still
    // present, recovery must finish the swap.
    val dir = grownLog()
    val before = rows(dir)
    val fs = new Path(dir).getFileSystem(conf())
    val olds = segFiles(dir, 0)
    val staged = new Path(dir, "_staging/compact/compacted-p0-legacy.parquet")
    spark.read.parquet(olds: _*).select("offset", "key", "value")
      .coalesce(1).sortWithinPartitions("offset")
      .write.parquet(s"$dir/_staging/compact/build")
    val built = fs.listStatus(new Path(s"$dir/_staging/compact/build"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(built, staged))
    // the legacy journal format: no trailing END line
    GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
      (Seq("0", staged.toString) ++ olds).mkString("\n"))
    fs.delete(new Path(olds.head), false) // finishSwap already started

    GraftLogMaintenance.recover(spark, dir)
    assert(segFiles(dir, 0).size === 1, "legacy journal was not finished")
    assert(rows(dir) === before, "legacy recovery lost or duplicated rows")
    assert(!fs.exists(new Path(dir, "_staging/compact/JOURNAL")))
  }

  test("TRUNCATED current-format journal with staged segment present aborts (no dup rows)") {
    // r15-advice defect: on a copy+delete-rename filesystem a crash
    // mid-publish can leave a truncated CURRENT-format journal (olds
    // cut short, END gone) that parses as legacy. The old recovery ran
    // finishSwap with the incomplete olds list — promoting the merged
    // segment (ALL rows) while the unlisted old segments survived,
    // silently duplicating every unlisted (partition, offset) row. At
    // that point staging has happened but nothing is deleted, so the
    // only safe action is abort; the incomplete olds list is provable
    // because a genuine legacy journal lists EVERY part file of p.
    val dir = grownLog()
    val before = rows(dir)
    val fs = new Path(dir).getFileSystem(conf())
    val olds = segFiles(dir, 0)
    assert(olds.size >= 3)
    val staged = new Path(dir, "_staging/compact/compacted-p0-torn.parquet")
    spark.read.parquet(olds: _*).select("offset", "key", "value")
      .coalesce(1).sortWithinPartitions("offset")
      .write.parquet(s"$dir/_staging/compact/build")
    val built = fs.listStatus(new Path(s"$dir/_staging/compact/build"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(built, staged))
    // current-format journal truncated after the first old: no END, and
    // olds.tail never made it onto disk at the journal path
    GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
      (Seq("0", staged.toString) :+ olds.head).mkString("\n"))

    GraftLogMaintenance.recover(spark, dir)
    assert(!fs.exists(new Path(dir, "_staging/compact/JOURNAL")),
      "truncated journal not aborted")
    assert(segFiles(dir, 0).toSet === olds.toSet,
      "abort must leave every old segment in place and promote nothing")
    assert(rows(dir) === before, "truncated-journal recovery changed the log")
    // the abandoned compaction re-runs cleanly afterwards
    val n1 = segFiles(dir, 1).size
    val merged = GraftLogMaintenance.compactSegments(spark, dir)
    assert(merged === Map(0 -> olds.size, 1 -> n1))
    assert(rows(dir) === before)
  }

  test("no-END journal with unlisted part files and staged gone fails loudly") {
    // Same truncation proof, but the merged segment is neither staged
    // nor absent — it was already promoted (dest exists) while part
    // files outside the olds list survive. No single action is safe:
    // deleting extras could drop rows, aborting leaves duplicates.
    val dir = grownLog()
    val fs = new Path(dir).getFileSystem(conf())
    val olds = segFiles(dir, 0)
    val dest = new Path(dir, "partition=0/compacted-p0-promoted.parquet")
    spark.read.parquet(olds.head).write.parquet(s"$dir/_staging/compact/build")
    val built = fs.listStatus(new Path(s"$dir/_staging/compact/build"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(built, dest))
    GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
      (Seq("0", s"$dir/_staging/compact/${dest.getName}") :+ olds.head)
        .mkString("\n"))
    val e = intercept[IllegalStateException](
      GraftLogMaintenance.recover(spark, dir))
    assert(e.getMessage.contains("not listed as olds"), e.toString)
    assert(fs.exists(new Path(dir, "_staging/compact/JOURNAL")),
      "an unrecognized journal must be left in place for manual recovery")
  }

  test("no-END journal with merged segment gone and olds partially deleted fails loudly") {
    val dir = grownLog()
    val fs = new Path(dir).getFileSystem(conf())
    val olds = segFiles(dir, 0)
    GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
      (Seq("0", s"$dir/_staging/compact/gone.parquet") ++ olds).mkString("\n"))
    fs.delete(new Path(olds.head), false)
    val e = intercept[IllegalStateException](GraftLogMaintenance.recover(spark, dir))
    assert(e.getMessage.contains("refusing to auto-recover"), e.toString)
    assert(fs.exists(new Path(dir, "_staging/compact/JOURNAL")),
      "an unrecognized journal must be left in place for manual recovery")
  }

  test("crash BEFORE the journal (staged leftovers only) aborts cleanly") {
    val dir = grownLog()
    val before = rows(dir)
    val fs = new Path(dir).getFileSystem(conf())
    // staged debris without a journal: the next compaction sweeps it
    val (n0, n1) = (segFiles(dir, 0).size, segFiles(dir, 1).size)
    GraftLog.writeSmall(fs,
      new Path(dir, "_staging/compact/compacted-p0-orphan.parquet"), "junk")
    val merged = GraftLogMaintenance.compactSegments(spark, dir)
    assert(merged === Map(0 -> n0, 1 -> n1))
    assert(rows(dir) === before)
    assert(!new java.io.File(s"$dir/_staging").exists())
  }
}
