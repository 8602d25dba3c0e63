package graft.sources

import graft.SparkSuite
import org.apache.hadoop.fs.Path

import java.nio.file.Files

/**
 * Crash-injection fuzz of the compaction journal: random crash states
 * drawn from the lattice the protocol can actually produce —
 * {journal format: current-with-END | legacy-no-END} × {0..n old
 * segments already deleted} × {staged promoted or not} × {journal
 * removed or not} — plus the pre-journal shapes (staged debris only,
 * torn JOURNAL.tmp). After every injected crash, `recover()` must
 * leave the log's ROWS AND POSITIONS exactly as they were, a follow-up
 * `compactSegments` must land one segment per partition with the same
 * rows, and the producer must keep appending densely. This is the
 * randomized pin on the r15 legacy-journal fix: the one state the old
 * code destroyed (legacy journal + partially deleted olds) is inside
 * the sweep.
 *
 * Also injected (r16): a truncated journal AT the journal path — the
 * copy+delete-rename crash shape — cut at a RANDOM byte of the full
 * current-format record, with the staged segment still present (the
 * only state that ordering can produce). Recovery must never finish a
 * swap off an incomplete olds list (that duplicates every unlisted
 * row); the completeness proof is that a genuine legacy journal lists
 * every part file of the partition.
 */
class GraftLogMaintenanceFuzzSuite extends SparkSuite {

  private def conf() = spark.sessionState.newHadoopConf()

  private def grownLog(appends: Int): String = {
    val dir = Files.createTempDirectory("graftlog-cfz").toString
    GraftLog.materialize(
      spark.range(0, 12)
        .selectExpr("cast(id % 2 as int) as partition", "id div 2 as offset",
          "cast(id as string) as key", "concat('v', id) as value"),
      dir)
    (1 to appends).foreach { i =>
      GraftLog.append(spark.range(i * 100, i * 100 + 6)
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

  /** Stage the merged segment for partition `p` exactly as compactOne
    * does, returning (staged path, old segment paths). */
  private def stage(dir: String, p: Int): (Path, Seq[String]) = {
    val fs = new Path(dir).getFileSystem(conf())
    val olds = segFiles(dir, p)
    val staged = new Path(dir, s"_staging/compact/compacted-p$p-fuzz.parquet")
    spark.read.parquet(olds: _*).select("offset", "key", "value")
      .coalesce(1).sortWithinPartitions("offset")
      .write.mode("overwrite").parquet(s"$dir/_staging/compact/build")
    val built = fs.listStatus(new Path(s"$dir/_staging/compact/build"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(built, staged))
    fs.delete(new Path(s"$dir/_staging/compact/build"), true)
    (staged, olds)
  }

  test("random crash states: recover + compact always preserve rows, positions, density") {
    val rnd = new scala.util.Random(83L)
    for (iter <- 0 until 10) {
      val dir = grownLog(2 + rnd.nextInt(3))
      val fs = new Path(dir).getFileSystem(conf())
      val before = rows(dir)
      val positions = GraftLog.latestOffsets(dir, conf())
      val p = rnd.nextInt(2)

      // draw a crash state the protocol can actually produce
      val scenario = rnd.nextInt(7)
      val desc = new StringBuilder(s"iter $iter p$p scenario $scenario")
      scenario match {
        case 0 => // staged debris, crash before the journal
          stage(dir, p)
        case 1 => // torn JOURNAL.tmp next to staged (crash mid temp write)
          val (staged, olds) = stage(dir, p)
          GraftLog.writeSmall(fs, new Path(dir, s"_staging/compact/JOURNAL.tmp-p$p"),
            (Seq(p.toString, staged.toString) ++ olds.take(1)).mkString("\n"))
        case 2 => // TRUNCATED journal at the journal path (copy+delete-
          // rename crash mid-publish): random byte cut of the full
          // record, staged present, nothing deleted yet
          val (staged, olds) = stage(dir, p)
          val full = (Seq(p.toString, staged.toString) ++ olds :+ "END")
            .mkString("\n")
          val cut = 1 + rnd.nextInt(full.length - 1)
          GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
            full.take(cut))
          desc ++= s" cut=$cut/${full.length}"
        case _ => // journal published (current or legacy), crash inside finishSwap
          val (staged, olds) = stage(dir, p)
          val legacy = rnd.nextBoolean()
          val body = Seq(p.toString, staged.toString) ++ olds
          GraftLog.writeSmall(fs, new Path(dir, "_staging/compact/JOURNAL"),
            (if (legacy) body else body :+ "END").mkString("\n"))
          val deleted = rnd.nextInt(olds.length + 1)
          olds.take(deleted).foreach(f => fs.delete(new Path(f), false))
          val promoted = deleted == olds.length && rnd.nextBoolean()
          if (promoted) {
            val dest = new Path(dir, s"partition=$p/${staged.getName}")
            assert(fs.rename(staged, dest))
            if (rnd.nextBoolean()) fs.delete(new Path(dir, "_staging/compact/JOURNAL"), false)
          }
          desc ++= s" legacy=$legacy deleted=$deleted/${olds.length} promoted=$promoted"
      }

      GraftLogMaintenance.recover(spark, dir)
      assert(rows(dir) === before, s"$desc: recovery changed the log rows")
      assert(GraftLog.latestOffsets(dir, conf()) === positions,
        s"$desc: recovery changed the positions")

      // a full compaction after recovery lands one segment per partition
      GraftLogMaintenance.compactSegments(spark, dir)
      assert(segFiles(dir, 0).size === 1 && segFiles(dir, 1).size === 1,
        s"$desc: post-recovery compaction did not fold to one segment")
      assert(rows(dir) === before, s"$desc: compaction changed the log rows")

      // and the producer keeps appending densely
      GraftLog.append(spark.range(0, 4)
        .selectExpr("cast(id % 2 as int) as partition",
          "concat('z', id) as key", "concat('z', id) as value"), dir)
      val after = GraftLog.latestOffsets(dir, conf())
      assert(after === positions.map { case (k, v) => k -> (v + 2) },
        s"$desc: post-recovery append not dense: $after vs $positions")
    }
  }
}
