package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

/**
 * STREAMING-READER SOAK against live maintenance (r17 verdict task 5):
 * the r17 catalog soak covered BATCH SQL readers racing
 * compact/TRUNCATE/recover; this one runs a `readStream` microbatch
 * query across compaction swaps — `latestOffset` + `planInputPartitions`
 * execute under the maintenance seqlock across many epochs of ONE
 * query's lifetime (checkpointed restarts included).
 *
 * Contract under test, per delivered microbatch and across the whole
 * run: LOUD-OR-VALID. Every (partition, offset) is delivered with a
 * write-once value; offsets within a microbatch are contiguous per
 * partition; the union of all delivered batches is a dense offset
 * prefix whose values sit at exactly the positions the serialized
 * appends assigned (offset 3i..3i+2 carries batch i's rows — a
 * compaction swap never renumbers). A query that catches a swap
 * mid-plan may die with the seqlock's error (or a missing-file error
 * from a removed pre-compaction segment) — that is the LOUD arm; the
 * restarted query resumes from the checkpoint and redelivers, never
 * skips. Silent loss, reorder, or cross-swap mixing fails the soak.
 */
class GraftLogStreamMaintenanceSoakSuite extends SparkSuite {

  private val AllowedRace = Seq("maintenance", "_maint/SEQ",
    "does not exist", "FILE_NOT_EXIST", "FileNotFound", "FAILED_READ_FILE")

  private def isAllowedRace(t: Throwable): Boolean = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 16) {
      val m = Option(cur.getMessage).getOrElse("")
      if (AllowedRace.exists(m.contains) ||
        cur.isInstanceOf[java.io.FileNotFoundException]) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  test("microbatches racing compaction: dense write-once prefixes, loud-or-valid, checkpointed restarts resume") {
    val root = java.nio.file.Files.createTempDirectory("glog-stream-soak").toString
    val dir = s"$root/mt"
    val cp = s"$root/cp"
    spark.conf.set("spark.sql.catalog.gss", classOf[GraftLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.gss.root", root)

    // each append lands 3 rows per partition; value encodes the batch
    // index so the final dense prefix can be checked position-by-position
    def append(i: Int): Unit = GraftLog.appendBatch(
      spark.range(0, 6).selectExpr("cast(id % 2 as int) as partition",
        s"concat('b$i-', id) as key", s"concat('b$i-', id) as value"),
      dir, batchId = i.toLong)

    val delivered = new ConcurrentHashMap[(Int, Long), String]()
    val failure = new AtomicReference[Throwable](null)
    val loudRaces = new AtomicInteger(0)
    val restarts = new AtomicInteger(0)

    def record(df: DataFrame, batchId: Long): Unit = try {
      val rows = df.selectExpr("partition", "offset", "value").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      // contiguous per partition WITHIN the microbatch: the planned
      // range is (start, end] per partition, never a gapped subset
      rows.groupBy(_._1).foreach { case (p, rs) =>
        val offs = rs.map(_._2).sorted.toSeq
        assert(offs == (offs.head to offs.last).toSeq,
          s"microbatch $batchId partition $p gapped: $offs")
      }
      rows.foreach { case (p, o, v) =>
        val prev = delivered.putIfAbsent((p, o), v)
        assert(prev == null || prev == v,
          s"write-once violated at ($p, $o): '$v' after '$prev'")
      }
    } catch {
      case t: Throwable => failure.compareAndSet(null, t); throw t
    }

    def start() = spark.readStream.format("graftlog")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch(record _)
      .start()

    append(0)
    var query = start()
    val rnd = new scala.util.Random(1822L)
    var appends = 1
    try {
      for (i <- 1 until 16 if failure.get() == null) {
        rnd.nextInt(4) match {
          case 0 | 1 =>
            append(appends); appends += 1
          case 2 =>
            append(appends); appends += 1 // ≥2 segments so the swap runs
            spark.sql("CALL gss.system.compact_segments(`table` => 'mt')")
              .collect()
          case _ =>
            spark.sql("CALL gss.system.recover_compaction(`table` => 'mt')")
              .collect()
        }
        Thread.sleep(150)
        // the LOUD arm: a query that caught a swap mid-plan died with
        // the seqlock/missing-file error — restart from the checkpoint
        if (!query.isActive) {
          val e = query.exception.orNull
          assert(e != null && isAllowedRace(e),
            s"query died without an allowed race: $e")
          loudRaces.incrementAndGet()
          restarts.incrementAndGet()
          query = start()
        }
      }
      // drain: every appended row must arrive (restarting through any
      // remaining loud races — redelivery, never skipping)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var drained = false
      while (!drained && failure.get() == null) {
        assert(System.nanoTime() < deadline,
          s"drain timed out at ${delivered.size()}/${appends * 6} rows " +
            s"(loud=$loudRaces restarts=$restarts)")
        try {
          query.processAllAvailable()
          drained = delivered.size() >= appends * 6
          if (!drained) Thread.sleep(100)
        } catch {
          case t: Throwable if isAllowedRace(t) ||
              query.exception.exists(isAllowedRace) =>
            loudRaces.incrementAndGet()
            restarts.incrementAndGet()
            if (!query.isActive) query = start() else Thread.sleep(100)
        }
      }
    } finally {
      try query.stop() catch { case _: Throwable => () }
    }
    if (failure.get() != null) throw failure.get()

    // the union of all delivered microbatches is a DENSE prefix per
    // partition, and position o carries append-batch o/3's value —
    // compaction swaps never renumbered or reordered anything
    val byPartition = {
      import scala.jdk.CollectionConverters._
      delivered.asScala.toSeq.map { case ((p, o), v) => (p, o, v) }
        .groupBy(_._1)
    }
    assert(byPartition.keySet == Set(0, 1), s"partitions: ${byPartition.keySet}")
    byPartition.foreach { case (p, rows) =>
      val offs = rows.map(_._2).sorted.toSeq
      assert(offs == (0L until (appends * 3).toLong).toSeq,
        s"partition $p not the full dense prefix: ${offs.take(10)}... " +
          s"(${offs.length} of ${appends * 3})")
      rows.foreach { case (_, o, v) =>
        assert(v.startsWith(s"b${o / 3}-"),
          s"partition $p offset $o carries '$v', expected batch ${o / 3}")
      }
    }
  }

  test("TRUNCATE under a checkpointed stream: loud stale-checkpoint error, never mixed incarnations") {
    // the r18 soak covered compaction swaps + recover; TRUNCATE is the
    // other incarnation-changing op (GraftLogCatalog.truncateTable) —
    // the log restarts at offset 0 in the SAME offset space, so a stale
    // checkpoint has already "committed" the new incarnation's offsets.
    // Contract: the live stream and every restart from that checkpoint
    // must FAIL LOUDLY (no consistent redelivery exists — the error
    // says to start a new checkpoint); deliberately NOT demotable by
    // failOnDataLoss, which governs forward loss only. A fresh
    // checkpoint reads the new incarnation from 0.
    val root = java.nio.file.Files.createTempDirectory("glog-stream-trunc").toString
    val dir = s"$root/tt"
    val cp = s"$root/cp"
    spark.conf.set("spark.sql.catalog.gst", classOf[GraftLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.gst.root", root)
    def append(i: Int): Unit = GraftLog.appendBatch(
      spark.range(0, 4).selectExpr("cast(id % 2 as int) as partition",
        s"concat('b$i-', id) as key", s"concat('b$i-', id) as value"),
      dir, batchId = i.toLong)

    val delivered = new ConcurrentHashMap[(Int, Long), String]()
    def start(where: String, failOnDataLoss: Boolean = true,
        sink: ConcurrentHashMap[(Int, Long), String] = delivered) =
      spark.readStream.format("graftlog")
        .option("path", dir)
        .option("failOnDataLoss", failOnDataLoss.toString).load()
        .writeStream.option("checkpointLocation", where)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.selectExpr("partition", "offset", "value").collect().foreach { r =>
            val prev = sink.putIfAbsent((r.getInt(0), r.getLong(1)), r.getString(2))
            assert(prev == null || prev == r.getString(2),
              s"write-once violated (mixed incarnations?): $r after '$prev'")
          }
        }.start()

    append(0); append(1)
    val q1 = start(cp)
    q1.processAllAvailable()
    assert(delivered.size() == 8)

    // TRUNCATE while the checkpointed stream is live, then grow the new
    // incarnation past the old watermark — the silent-mixing window
    spark.sql("TRUNCATE TABLE gst.tt").collect()
    append(100)
    val e1 = intercept[Throwable] { q1.processAllAvailable() }
    assert(chainContains(e1, "truncated or rewritten"),
      s"live stream must go loud on truncation: $e1")
    try q1.stop() catch { case _: Throwable => () }

    // a RESTART from the stale checkpoint is loud too — never a silent
    // resume, and failOnDataLoss=false does NOT demote it (forward-loss
    // opt-out only; redelivery in a reused offset space cannot be
    // consistent)
    Seq(true, false).foreach { fodl =>
      val qr = start(cp, failOnDataLoss = fodl)
      val er = intercept[Throwable] { qr.processAllAvailable() }
      assert(chainContains(er, "truncated or rewritten"),
        s"stale-checkpoint restart (failOnDataLoss=$fodl) must be loud: $er")
      try qr.stop() catch { case _: Throwable => () }
    }

    // nothing from the new incarnation ever reached the stale
    // checkpoint's sink — no mixed delivery in any window above
    delivered.forEach((k, v) => assert(v.startsWith("b0-") || v.startsWith("b1-"),
      s"mixed incarnation delivered at $k: '$v'"))

    // the sanctioned recovery: a FRESH checkpoint reads the new
    // incarnation from offset 0
    val fresh = new ConcurrentHashMap[(Int, Long), String]()
    val q2 = start(s"$root/cp2", sink = fresh)
    try q2.processAllAvailable() finally q2.stop()
    assert(fresh.size() == 4, s"fresh checkpoint: ${fresh.size()} rows")
    fresh.forEach((k, v) => assert(v.startsWith("b100-"),
      s"fresh checkpoint saw old-incarnation value at $k: '$v'"))
    (0 to 1).foreach { p =>
      val offs = {
        import scala.jdk.CollectionConverters._
        fresh.asScala.keys.filter(_._1 == p).map(_._2).toSeq.sorted
      }
      assert(offs == (0L until 2L).toSeq, s"partition $p: $offs")
    }
  }

  test("TRUNCATE then regrowth PAST the old watermark: the incarnation stamp keeps the stale checkpoint loud") {
    // r20 (r19 advice, medium): the r19 guards compare committed
    // offsets against the current log end, so they fire only while the
    // replacement log is still SHORTER than the watermark. A stream
    // STOPPED across a TRUNCATE whose replacement grows past the
    // committed offsets before the restart hit the silent-resume
    // timing. The `_maint/INC` stamp (bumped by truncateTable, carried
    // in every streaming offset) fails the restart INDEPENDENT of
    // relative offsets.
    val root = java.nio.file.Files.createTempDirectory("glog-stream-inc").toString
    val dir = s"$root/ti"
    val cp = s"$root/cp"
    spark.conf.set("spark.sql.catalog.gsi", classOf[GraftLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsi.root", root)
    def append(i: Int): Unit = GraftLog.appendBatch(
      spark.range(0, 4).selectExpr("cast(id % 2 as int) as partition",
        s"concat('b$i-', id) as key", s"concat('b$i-', id) as value"),
      dir, batchId = i.toLong)
    val delivered = new ConcurrentHashMap[(Int, Long), String]()
    def start(where: String, failOnDataLoss: Boolean = true,
        sink: ConcurrentHashMap[(Int, Long), String] = delivered) =
      spark.readStream.format("graftlog")
        .option("path", dir)
        .option("failOnDataLoss", failOnDataLoss.toString).load()
        .writeStream.option("checkpointLocation", where)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.selectExpr("partition", "offset", "value").collect().foreach { r =>
            val prev = sink.putIfAbsent((r.getInt(0), r.getLong(1)), r.getString(2))
            assert(prev == null || prev == r.getString(2),
              s"write-once violated (mixed incarnations?): $r after '$prev'")
          }
        }.start()

    append(0); append(1)
    val q1 = start(cp)
    q1.processAllAvailable()
    q1.stop() // the stream is STOPPED across the truncate — the timing hole
    assert(delivered.size() == 8)

    spark.sql("TRUNCATE TABLE gsi.ti").collect()
    // the replacement GROWS PAST the committed watermark (6 offsets per
    // partition vs 4 committed) — every committed offset is in range,
    // so the r19 offset checks alone would resume silently here
    append(100); append(101); append(102)

    Seq(true, false).foreach { fodl =>
      val qr = start(cp, failOnDataLoss = fodl)
      val er = intercept[Throwable] { qr.processAllAvailable() }
      assert(chainContains(er, "incarnation"),
        s"regrown-log restart (failOnDataLoss=$fodl) must fail on the " +
          s"incarnation stamp: $er")
      try qr.stop() catch { case _: Throwable => () }
    }
    // nothing from the new incarnation ever reached the stale sink
    delivered.forEach((k, v) => assert(v.startsWith("b0-") || v.startsWith("b1-"),
      s"mixed incarnation delivered at $k: '$v'"))

    // the sanctioned recovery reads all 12 new-incarnation rows from 0
    val fresh = new ConcurrentHashMap[(Int, Long), String]()
    val q2 = start(s"$root/cp2", sink = fresh)
    try q2.processAllAvailable() finally q2.stop()
    assert(fresh.size() == 12, s"fresh checkpoint: ${fresh.size()} rows")
    fresh.forEach((k, v) => assert(v.startsWith("b10"),
      s"fresh checkpoint saw old-incarnation value at $k: '$v'"))
  }

  private def chainContains(t: Throwable, needle: String): Boolean = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 16) {
      if (Option(cur.getMessage).exists(_.contains(needle))) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  test("a held seqlock makes the stream loud mid-flight; the restarted query resumes without loss") {
    // the DETERMINISTIC loud arm (the soak above can only race): crash a
    // maintenance mid-swap (odd SEQ) while a stream is live — the next
    // microbatch plan must FAIL, not deliver a silent subset; settling
    // the lock and restarting from the checkpoint redelivers everything
    val root = java.nio.file.Files.createTempDirectory("glog-stream-seq").toString
    val dir = s"$root/sq"
    val cp = s"$root/cp"
    def append(i: Int): Unit = GraftLog.appendBatch(
      spark.range(0, 4).selectExpr("cast(id % 2 as int) as partition",
        s"concat('b$i-', id) as key", s"concat('b$i-', id) as value"),
      dir, batchId = i.toLong)

    val delivered = new ConcurrentHashMap[(Int, Long), String]()
    def start() = spark.readStream.format("graftlog")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.selectExpr("partition", "offset", "value").collect().foreach { r =>
          val prev = delivered.putIfAbsent((r.getInt(0), r.getLong(1)), r.getString(2))
          assert(prev == null || prev == r.getString(2), s"write-once violated: $r")
        }
      }.start()

    append(0)
    val q1 = start()
    q1.processAllAvailable()
    assert(delivered.size() == 4)

    // append more rows FIRST (the writer itself refuses a held lock —
    // also the loud contract), then hold the lock (simulated maintenance
    // crash): the stream must go LOUD on its next poll/plan, never skip
    // or deliver a silent subset
    append(1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val seq = GraftLogMaintenance.maintenanceSeq(fs, dir)
    GraftLog.writeSmall(fs,
      new org.apache.hadoop.fs.Path(dir, "_maint/SEQ"), (seq + 1).toString)
    val e = intercept[Throwable] { q1.processAllAvailable() }
    assert(isAllowedRace(e), s"held seqlock must make the stream loud: $e")
    try q1.stop() catch { case _: Throwable => () }

    // settle the lock; the restarted query resumes from the checkpoint
    GraftLog.writeSmall(fs,
      new org.apache.hadoop.fs.Path(dir, "_maint/SEQ"), (seq + 2).toString)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(delivered.size() == 8, s"resume lost rows: ${delivered.size()}")
    (0 to 1).foreach { p =>
      val offs = {
        import scala.jdk.CollectionConverters._
        delivered.asScala.keys.filter(_._1 == p).map(_._2).toSeq.sorted
      }
      assert(offs == (0L until 4L).toSeq, s"partition $p: $offs")
    }
  }
}
