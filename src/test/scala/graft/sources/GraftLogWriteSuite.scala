package graft.sources

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The native V2 write path: batch append and exactly-once streaming
  * sink, both with task-local offset assignment under the clustered
  * write distribution and rename-promoted staged segments. */
class GraftLogWriteSuite extends SparkSuite {

  private def writeLog(n: Int, parts: Int): String = {
    val dir = Files.createTempDirectory("graftlog-w").toString
    GraftLog.materialize(
      spark.range(0, n.toLong)
        .selectExpr(s"cast(id % $parts as int) as partition",
          s"id div $parts as offset",
          "cast(id as string) as key", "concat('v', id) as value"),
      dir)
    dir
  }

  private def logRows(dir: String): Seq[(Int, Long, String, String)] =
    spark.read.format("graftlog").option("path", dir).load()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def segFiles(dir: String, p: Int): Int =
    Option(new java.io.File(s"$dir/partition=$p").listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)

  test("batch write with offsets=assign appends dense offsets, one segment per partition") {
    val dir = writeLog(40, 4) // 10 offsets per partition
    val files0 = (0 until 4).map(segFiles(dir, _))
    spark.range(0, 12)
      .selectExpr("cast(id % 3 as int) as partition", "cast(-1 as long) as offset",
        "concat('k', id) as key", "concat('nv', id) as value")
      .write.format("graftlog").option("path", dir)
      .option("offsets", "assign").mode("append").save()

    val after = GraftLog.latestOffsets(dir, spark.sessionState.newHadoopConf())
    assert(after === Map(0 -> 14L, 1 -> 14L, 2 -> 14L, 3 -> 10L), after.toString)
    val rows = logRows(dir)
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2) === (0L until rs.length.toLong), s"partition $p not dense")
    }
    assert(rows.count(_._4.startsWith("nv")) === 12)
    // one new segment per touched partition, none for the untouched one
    (0 until 3).foreach(p => assert(segFiles(dir, p) === files0(p) + 1,
      s"partition $p grew by ${segFiles(dir, p) - files0(p)} files"))
    assert(segFiles(dir, 3) === files0(3))
    // staging is cleaned up
    assert(!new java.io.File(s"$dir/_staging").exists())
    // and the new segments carry footer stats (positions advance from them)
    assert(GraftLog.partitionEnd(dir, 0,
      spark.sessionState.newHadoopConf()) === 14L)
  }

  test("batch write with provided offsets enforces density; a gap fails loudly") {
    val dir = writeLog(20, 2) // 10 per partition
    // dense continuation: offsets 10..14 per partition
    spark.range(0, 10)
      .selectExpr("cast(id % 2 as int) as partition",
        "(10 + id div 2) as offset",
        "concat('k', id) as key", "concat('pv', id) as value")
      .write.format("graftlog").option("path", dir).mode("append").save()
    assert(GraftLog.latestOffsets(dir, spark.sessionState.newHadoopConf())
      === Map(0 -> 15L, 1 -> 15L))

    // a gap (next expected 15, provided 17) dies in the task, nothing lands
    val before = logRows(dir)
    val err = intercept[Exception] {
      spark.range(0, 2)
        .selectExpr("cast(id as int) as partition", "cast(17 as long) as offset",
          "'k' as key", "'bad' as value")
        .write.format("graftlog").option("path", dir).mode("append").save()
    }
    def all(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: all(t.getCause)
    assert(all(err).exists(t => Option(t.getMessage)
      .exists(_.contains("breaks density"))), err.toString)
    assert(logRows(dir) === before, "a failed write mutated the log")
  }

  test("streaming sink: crash after sink commit replays the epoch; output has zero duplicates") {
    val inDir = Files.createTempDirectory("graftlog-ws-in").toString
    val cpDir = Files.createTempDirectory("graftlog-ws-cp").toString
    val logDir = Files.createTempDirectory("graftlog-ws-log").toString
    val sparkS = spark
    import sparkS.implicits._

    def launch() = spark.readStream.schema("id LONG").parquet(s"$inDir/d*")
      .selectExpr("cast(id % 4 as int) as partition", "cast(-1 as long) as offset",
        "cast(id as string) as key", "concat('v', id) as value")
      .writeStream.format("graftlog")
      .option("path", logDir).option("offsets", "assign")
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()

    (0L until 40L).toDF("id").write.parquet(s"$inDir/d0")
    val q1 = launch(); q1.awaitTermination(60000)
    assert(logRows(logDir).length === 40)

    // simulate the crash-after-sink-commit ordering: the epoch's sink
    // commit (done marker) landed but the CHECKPOINT commit did not —
    // on restart Spark re-executes the same epoch end-to-end
    val fs = new Path(cpDir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new Path(cpDir, "commits/0"), false),
      "checkpoint commit marker to delete not found")
    val q2 = launch(); q2.awaitTermination(60000)

    val rows = logRows(logDir)
    assert(rows.length === 40, s"epoch replay duplicated rows: ${rows.length}")
    assert(rows.map(_._3.toLong).sorted === (0L until 40L))
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2) === (0L until rs.length.toLong), s"partition $p not dense")
    }

    // new data keeps flowing after the replayed epoch
    (40L until 60L).toDF("id").write.parquet(s"$inDir/d1")
    val q3 = launch(); q3.awaitTermination(60000)
    assert(logRows(logDir).map(_._3.toLong).sorted === (0L until 60L))
  }

  test("streaming sink with provided offsets survives a crash-after-commit replay") {
    // The r13-advice defect: in provided mode a replayed epoch's rows
    // carry offsets BELOW the (already advanced) footer end, and the
    // task-side density require killed the query before the driver's
    // skip-committed logic could run. The fix skips already-durable
    // rows task-side; this drives the exact crash ordering end-to-end.
    val inDir = Files.createTempDirectory("graftlog-wp-in").toString
    val cpDir = Files.createTempDirectory("graftlog-wp-cp").toString
    val logDir = Files.createTempDirectory("graftlog-wp-log").toString
    val sparkS = spark
    import sparkS.implicits._

    def launch() = spark.readStream.schema("id LONG").parquet(s"$inDir/d*")
      .selectExpr("cast(id % 4 as int) as partition", "id div 4 as offset",
        "cast(id as string) as key", "concat('v', id) as value")
      .writeStream.format("graftlog")
      .option("path", logDir) // offsets=provided is the default
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()

    (0L until 40L).toDF("id").write.parquet(s"$inDir/d0")
    val q1 = launch(); q1.awaitTermination(60000)
    assert(logRows(logDir).length === 40)

    // crash-after-sink-commit: done marker landed, checkpoint commit
    // did not — restart re-executes the epoch with the same offsets
    val fs = new Path(cpDir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new Path(cpDir, "commits/0"), false),
      "checkpoint commit marker to delete not found")
    val q2 = launch(); q2.awaitTermination(60000)

    val rows = logRows(logDir)
    assert(rows.length === 40, s"provided-mode replay duplicated rows: ${rows.length}")
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2) === (0L until rs.length.toLong), s"partition $p not dense")
    }

    // the stream keeps flowing after the replayed epoch
    (40L until 60L).toDF("id").write.parquet(s"$inDir/d1")
    val q3 = launch(); q3.awaitTermination(60000)
    assert(logRows(logDir).map(_._3.toLong).sorted === (0L until 60L))
  }

  test("streaming commit: a partially-torn epoch promotes only the missing partitions") {
    val dir = writeLog(10, 2) // partitions 0,1 at base 5
    val conf = spark.sessionState.newHadoopConf()
    val confBc = org.apache.spark.sql.graft.Shim.broadcastConf(
      spark.sparkContext, conf)
    val fs = new Path(dir).getFileSystem(conf)

    def stage(p: Int, base: Long, n: Int, tag: String): String = {
      val f = s"$dir/_staging/q/7/seg-p$p-$tag.parquet"
      val one = spark.range(0, n.toLong)
        .selectExpr(s"($base + id) as offset", s"concat('k$tag', id) as key",
          s"concat('$tag', id) as value")
        .coalesce(1)
      one.write.parquet(s"$dir/_staging/tmp-$tag")
      val part = new java.io.File(s"$dir/_staging/tmp-$tag").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      fs.mkdirs(new Path(f).getParent)
      assert(fs.rename(new Path(part.toString), new Path(f)))
      f
    }

    // first attempt: intent pinned at {0:5, 1:5}; partition 0's segment
    // promoted before the crash, partition 1's never staged to done
    val out = fs.create(new Path(dir, "_producer/q/7.intent"), true)
    out.write(GraftLog.offsetsToJson(Map(0 -> 5L, 1 -> 5L)).getBytes("UTF-8"))
    out.close()
    val p0first = stage(0, 5, 3, "a")
    GraftLogWrite.promote(dir, conf, 0, p0first)
    assert(GraftLog.latestOffsets(dir, conf) === Map(0 -> 8L, 1 -> 5L))

    // replay: tasks re-staged from CURRENT footers (p0 from 8 — stale
    // attempt to be skipped; p1 from its untouched base 5)
    val w = new GraftLogStreamingWrite(dir, s"$dir/_staging/q", "q", null, true, confBc)
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(GraftLogCommitMessage(Seq(
        (0, stage(0, 8, 3, "b"), 8L, 3L),
        (1, stage(1, 5, 3, "c"), 5L, 3L))))
    w.commit(7L, msgs)

    val after = GraftLog.latestOffsets(dir, conf)
    assert(after === Map(0 -> 8L, 1 -> 8L),
      s"torn replay must complete partition 1 only: $after")
    val rows = logRows(dir)
    assert(rows.count(_._4.startsWith("a")) === 3, "first attempt's promoted rows lost")
    assert(rows.count(_._4.startsWith("b")) === 0, "stale replay segment leaked in")
    assert(rows.count(_._4.startsWith("c")) === 3, "missing partition not completed")
    assert(fs.exists(new Path(dir, "_producer/q/7")), "done marker missing")

    // a THIRD delivery of the same epoch is a pure no-op
    w.commit(7L, Array(GraftLogCommitMessage(Seq((1, "unused", 8L, 3L)))))
    assert(logRows(dir) === rows)
  }
}
