package graft.sources

import graft.SparkSuite
import org.apache.hadoop.fs.Path

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

/**
 * CONCURRENT-READER SOAK of the catalog/maintenance faces (r17): the
 * r16 soaks covered EpochCommit and the producer; this one races SQL
 * readers (through [[GraftLogCatalog]]) against the visible-file
 * mutators — `compact_segments`, `recover_compaction`, TRUNCATE —
 * under randomized interleavings. Contract under test is the
 * maintenance SEQLOCK's: every read is LOUD-OR-VALID, never silent —
 * a successful read is a dense write-once offset prefix of exactly ONE
 * log incarnation; a read that raced maintenance fails with the
 * seqlock's error (or a missing-file scan error), never with silently
 * missing rows.
 */
class GraftLogCatalogSoakSuite extends SparkSuite {

  private def conf() = spark.sessionState.newHadoopConf()

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

  test("SQL readers racing compaction and TRUNCATE are loud-or-valid, never silent") {
    val root = java.nio.file.Files.createTempDirectory("glog-cat-soak").toString
    val dir = s"$root/mt"
    spark.conf.set("spark.sql.catalog.gms", classOf[GraftLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.gms.root", root)

    val gen = new AtomicInteger(0)
    def append(i: Int): Unit = {
      val g = gen.get()
      GraftLog.appendBatch(
        spark.range(0, 6)
          .selectExpr("cast(id % 2 as int) as partition",
            s"concat('g$g-b$i-', id) as key", s"concat('g$g-b$i-', id) as value"),
        dir, batchId = (g.toLong << 16) + i)
    }
    append(0)

    // (gen, partition, offset) -> value must never change once seen
    val seen = new ConcurrentHashMap[(Int, Int, Long), String]()
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    val loudRaces = new AtomicInteger(0)
    val goodReads = new AtomicInteger(0)

    def readerLoop(): Runnable = () => {
      try {
        while (!stop.get() && failure.get() == null) {
          try {
            val rows = spark.sql(
              "SELECT partition, offset, value FROM gms.mt").collect()
              .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
            // ONE incarnation per accepted read: values carry their gen
            val gens = rows.map(_._3.split("-")(0)).distinct
            assert(gens.length <= 1,
              s"read mixed log incarnations: ${gens.mkString(",")}")
            val g = gens.headOption.map(_.stripPrefix("g").toInt).getOrElse(-1)
            rows.groupBy(_._1).foreach { case (p, rs) =>
              val offs = rs.map(_._2).sorted.toSeq
              assert(offs == (0L until offs.length.toLong).toSeq,
                s"partition $p not a dense prefix in gen $g: $offs")
            }
            rows.foreach { case (p, o, v) =>
              val prev = seen.putIfAbsent((g, p, o), v)
              assert(prev == null || prev == v,
                s"write-once violated at (g$g, $p, $o): '$v' after '$prev'")
            }
            goodReads.incrementAndGet()
          } catch {
            case t: Throwable if isAllowedRace(t) =>
              loudRaces.incrementAndGet(); ()
          }
        }
      } catch {
        case t: Throwable => failure.compareAndSet(null, t); ()
      }
    }

    val threads = (0 until 3).map { k =>
      val t = new Thread(readerLoop(), s"glog-cat-soak-$k")
      t.setDaemon(true); t.start(); t
    }

    val rnd = new scala.util.Random(4243L)
    try {
      for (i <- 1 until 14 if failure.get() == null) {
        rnd.nextInt(5) match {
          case 0 | 1 => append(i)
          case 2 =>
            append(i) // guarantee ≥2 segments so the compactor swaps
            spark.sql("CALL gms.system.compact_segments(`table` => 'mt')")
              .collect()
          case 3 =>
            spark.sql("TRUNCATE TABLE gms.mt")
            gen.incrementAndGet()
            append(i)
          case _ =>
            spark.sql("CALL gms.system.recover_compaction(`table` => 'mt')")
              .collect()
        }
      }
      Thread.sleep(250)
    } finally {
      stop.set(true)
      threads.foreach(_.join(30000))
    }
    if (failure.get() != null) throw failure.get()
    assert(goodReads.get() > 0, "soak never completed a successful read")

    // settled state: one incarnation, dense, and readable
    val fin = spark.sql("SELECT partition, offset, value FROM gms.mt")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(fin.map(_._3.split("-")(0)).distinct.length <= 1)
    assert(fin.map(t => (t._1, t._2)).distinct.length == fin.length)
  }

  test("seqlock pins: held lock reads loudly; recover_compaction settles it; compaction is content-neutral") {
    val root = java.nio.file.Files.createTempDirectory("glog-seq-pin").toString
    val dir = s"$root/sq"
    spark.conf.set("spark.sql.catalog.gsq", classOf[GraftLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsq.root", root)
    (0 until 3).foreach { i =>
      GraftLog.appendBatch(
        spark.range(0, 4).selectExpr("cast(id % 2 as int) as partition",
          s"concat('s$i-', id) as key", s"concat('s$i-', id) as value"),
        dir, batchId = i.toLong)
    }
    val before = spark.sql("SELECT value FROM gsq.sq ORDER BY value")
      .collect().map(_.getString(0)).toSeq

    spark.sql("CALL gsq.system.compact_segments(`table` => 'sq')").collect()
    val fs = new Path(dir).getFileSystem(conf())
    val seqAfter = GraftLogMaintenance.maintenanceSeq(fs, dir)
    assert(seqAfter > 0 && seqAfter % 2 == 0,
      s"compaction must settle the seqlock even, saw $seqAfter")
    assert(spark.sql("SELECT value FROM gsq.sq ORDER BY value")
      .collect().map(_.getString(0)).toSeq == before,
      "compaction changed content")

    // a crash mid-maintenance leaves the lock held: reads go LOUD
    GraftLog.writeSmall(fs, new Path(dir, "_maint/SEQ"), (seqAfter + 1).toString)
    val e = intercept[Throwable] {
      spark.sql("SELECT count(*) FROM gsq.sq").collect()
    }
    assert(isAllowedRace(e) || Option(e.getMessage).exists(_.contains("maintenance")),
      s"held seqlock must read loudly, got: $e")
    // committed_offsets goes through the same validated listing
    val e2 = intercept[Throwable] {
      spark.sql("CALL gsq.system.committed_offsets(`table` => 'sq')").collect()
    }
    assert(isAllowedRace(e2), s"procedure must be loud under a held lock: $e2")

    // recover settles the lock (no journal -> nothing visible in flight)
    spark.sql("CALL gsq.system.recover_compaction(`table` => 'sq')").collect()
    assert(GraftLogMaintenance.maintenanceSeq(fs, dir) % 2 == 0)
    assert(spark.sql("SELECT value FROM gsq.sq ORDER BY value")
      .collect().map(_.getString(0)).toSeq == before)
  }
}
