package graft.sources

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Exactly-once produce into the native log: [[GraftLog.appendBatch]]
  * absorbs foreachBatch's at-least-once replays — a fully-committed
  * batchId short-circuits, a PARTIALLY-committed one (the multi-
  * partition tear [[GraftLog.append]]'s precondition can only fail
  * loudly on) completes exactly the missing partitions. Driven both
  * directly at each crash point and through a real checkpointed
  * streaming restart. */
class GraftLogProducerSuite extends SparkSuite {

  private def writeLog(n: Int, parts: Int): String = {
    val dir = Files.createTempDirectory("graftlog-prod").toString
    GraftLog.materialize(
      spark.range(0, n.toLong)
        .selectExpr(s"cast(id % $parts as int) as partition",
          s"id div $parts as offset",
          "cast(id as string) as key", "concat('v', id) as value"),
      dir)
    dir
  }

  private def logRows(dir: String): Seq[(Int, Long, String)] =
    spark.read.format("graftlog").option("path", dir).load()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def conf() = spark.sessionState.newHadoopConf()

  test("a replayed committed batchId is skipped outright; new partitions bootstrap at 0") {
    val dir = writeLog(10, 2) // partitions 0,1 with 5 offsets each
    val batch = spark.range(0, 9)
      .selectExpr("cast(id % 3 as int) as partition", // partition 2 is NEW
        "concat('k', id) as key", "concat('nv', id) as value")
    val after1 = GraftLog.appendBatch(batch, dir, batchId = 1L)
    assert(after1 === Map(0 -> 8L, 1 -> 8L, 2 -> 3L), after1.toString)
    val rows1 = logRows(dir)
    // replay of the SAME batchId: no movement, no duplicates
    val after2 = GraftLog.appendBatch(batch, dir, batchId = 1L)
    assert(after2 === after1)
    assert(logRows(dir) === rows1)
    // offsets stay dense per partition
    rows1.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2) === (0L until rs.length.toLong), s"partition $p not dense")
    }
  }

  test("partial-commit replay completes only the missing partitions — the tear append() can only fail on") {
    val dir = writeLog(10, 2)
    val bases = GraftLog.latestOffsets(dir, conf())
    val batch = spark.range(0, 8)
      .selectExpr("cast(id % 2 as int) as partition",
        "concat('k', id) as key", "concat('nv', id) as value")

    // simulate the first attempt: intent recorded, then the commit
    // phase tore — partition 0's segment landed, partition 1's did not
    val fs = new Path(dir).getFileSystem(conf())
    fs.mkdirs(new Path(dir, "_producer/default"))
    val out = fs.create(new Path(dir, "_producer/default/7.intent"), true)
    out.write(GraftLog.offsetsToJson(bases).getBytes("UTF-8")); out.close()
    GraftLog.append(batch.filter(col("partition") === 0), dir)
    assert(GraftLog.latestOffsets(dir, conf()) === Map(0 -> 9L, 1 -> 5L))

    // the bare producer face would fail this replay loudly...
    val err = intercept[IllegalArgumentException] {
      GraftLog.append(batch, dir, expectedBases = Some(bases))
    }
    assert(err.getMessage.contains("already advanced"))

    // ...the idempotent face completes it: partition 0 untouched,
    // partition 1 written from ITS base
    val after = GraftLog.appendBatch(batch, dir, batchId = 7L)
    assert(after === Map(0 -> 9L, 1 -> 9L), after.toString)
    val rows = logRows(dir)
    assert(rows.count(_._3.startsWith("nv")) === 8, "lost or duplicated batch rows")
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length,
      "duplicate (partition, offset)")
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2) === (0L until rs.length.toLong), s"partition $p not dense")
    }
    assert(fs.exists(new Path(dir, "_producer/default/7")), "done marker missing")

    // and a SECOND replay after full commit is a pure no-op
    assert(GraftLog.appendBatch(batch, dir, batchId = 7L) === after)
    assert(logRows(dir) === rows)
  }

  test("randomized replay/tear sequences stay exactly-once (producer fuzz)") {
    // Compose the scripted crash orderings at random: clean commits,
    // torn first attempts (intent recorded, a random partition subset's
    // segments landed) completed by replay, and replays of arbitrary
    // OLD batchIds interleaved mid-stream. Whatever the sequence, every
    // batch's rows land EXACTLY once, (partition, offset) stays unique,
    // and every partition stays dense.
    val rnd = new scala.util.Random(59L)
    val dir = writeLog(6, 2)
    val fs = new Path(dir).getFileSystem(conf())
    val expected = scala.collection.mutable.ArrayBuffer.empty[String]
    expected ++= logRows(dir).map(_._3)
    val batches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    for (i <- 0 until 12) {
      val k = 4 + rnd.nextInt(5)
      val parts = 2 + (if (rnd.nextInt(4) == 0) 1 else 0) // partition 2 appears sometimes
      val batch = spark.range(0, k.toLong)
        .selectExpr(s"cast(id % $parts as int) as partition",
          s"concat('b$i-', id) as key", s"concat('b$i-', id) as value")
      batches += batch

      if (rnd.nextInt(10) < 3) {
        // torn first attempt: intent + a random (possibly empty) subset
        // of partitions already committed, then the replay completes it
        val bases = GraftLog.latestOffsets(dir, conf())
        fs.mkdirs(new Path(dir, "_producer/default"))
        val out = fs.create(new Path(dir, s"_producer/default/$i.intent"), true)
        out.write(GraftLog.offsetsToJson(bases).getBytes("UTF-8")); out.close()
        val subset = (0 until parts).filter(_ => rnd.nextBoolean())
        if (subset.nonEmpty)
          GraftLog.append(batch.filter(col("partition").isin(subset.map(Int.box): _*)), dir)
      }
      GraftLog.appendBatch(batch, dir, batchId = i.toLong)
      expected ++= (0 until k).map(j => s"b$i-$j")

      if (i > 0 && rnd.nextInt(10) < 4) {
        // replay a random OLD batchId with its original frame: no-op
        val old = rnd.nextInt(i)
        GraftLog.appendBatch(batches(old), dir, batchId = old.toLong)
      }

      val rows = logRows(dir)
      assert(rows.map(_._3).sorted === expected.sorted.toSeq,
        s"iter $i: rows diverged from the exactly-once model")
      assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length,
        s"iter $i: duplicate (partition, offset)")
      rows.groupBy(_._1).foreach { case (p, rs) =>
        assert(rs.map(_._2) === (0L until rs.length.toLong),
          s"iter $i: partition $p not dense")
      }
    }
  }

  test("producerId scopes markers: a recreated pipeline's restarted batchIds do not collide") {
    val dir = writeLog(8, 2)
    val mk = (tag: String) => spark.range(0, 4)
      .selectExpr("cast(id % 2 as int) as partition",
        s"concat('k$tag', id) as key", s"concat('$tag', id) as value")
    // incarnation A commits batch 1, then its checkpoint is lost
    GraftLog.appendBatch(mk("a"), dir, batchId = 1L, producerId = "runA")
    // incarnation B restarts batchIds from 1 — with an UNSCOPED
    // namespace this batch would be skipped as A's replay
    val after = GraftLog.appendBatch(mk("b"), dir, batchId = 1L, producerId = "runB")
    assert(after === Map(0 -> 8L, 1 -> 8L), after.toString)
    val rows = logRows(dir)
    assert(rows.count(_._3.startsWith("a")) === 4, "incarnation A's rows lost")
    assert(rows.count(_._3.startsWith("b")) === 4,
      "incarnation B's batch was dropped as a cross-incarnation 'replay'")
    val fs = new Path(dir).getFileSystem(conf())
    assert(fs.exists(new Path(dir, "_producer/runA/1")))
    assert(fs.exists(new Path(dir, "_producer/runB/1")))
    // within one incarnation the replay protocol still holds
    assert(GraftLog.appendBatch(mk("b"), dir, 1L, "runB") === after)
    assert(logRows(dir) === rows)
  }

  test("streaming produce→consume loop: crash after commit, restart replays, zero duplicate offsets") {
    val sparkS = spark
    import sparkS.implicits._
    val inDir = Files.createTempDirectory("graftlog-prod-in").toString
    val cpDir = Files.createTempDirectory("graftlog-prod-cp").toString
    val logDir = Files.createTempDirectory("graftlog-prod-log").toString
    val schema = "id LONG, run INT"

    // crash injection: first delivery of any batch containing run=1
    // dies AFTER the producer committed — the window Spark re-delivers
    @volatile var crashed = false
    def producer(df: DataFrame, batchId: Long): Unit = {
      val poison = df.filter(df("run") === 1).count() > 0
      GraftLog.appendBatch(
        df.selectExpr("cast(id % 4 as int) as partition",
          "cast(id as string) as key", "concat('v', id) as value"),
        logDir, batchId)
      if (poison && !crashed) {
        crashed = true
        throw new RuntimeException("injected crash after producer commit")
      }
    }
    def launch() = spark.readStream.schema(schema).parquet(s"$inDir/d*")
      .writeStream.option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(producer _).start()

    (0L until 40L).map((_, 0)).toDF("id", "run").write.parquet(s"$inDir/d0")
    val q1 = launch(); q1.awaitTermination(60000)

    (40L until 70L).map((_, 1)).toDF("id", "run").write.parquet(s"$inDir/d1")
    val q2 = launch()
    intercept[Exception] { q2.awaitTermination(60000) }
    assert(crashed, "injected crash did not fire")

    (70L until 80L).map((_, 2)).toDF("id", "run").write.parquet(s"$inDir/d2")
    val q3 = launch(); q3.awaitTermination(60000)

    // the log holds every input row EXACTLY once, dense per partition
    val rows = logRows(logDir)
    assert(rows.length === 80, s"expected 80 rows, got ${rows.length}")
    assert(rows.map(_._3).sorted === (0L until 80L).map(i => s"v$i").sorted,
      "loss or duplication across the replay")
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2) === (0L until rs.length.toLong), s"partition $p not dense")
    }
    // and the V2 consumer side agrees end-to-end — through the ROW path
    // (a bare count() is answered from footer stats by the aggregate
    // pushdown and could not see duplicated rows)
    val consumed = spark.read.format("graftlog").option("path", logDir).load()
    assert(consumed.select("partition", "offset").distinct().count() === 80)
    assert(consumed.collect().length === 80)
  }
}
