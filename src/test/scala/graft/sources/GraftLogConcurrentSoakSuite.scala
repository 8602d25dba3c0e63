package graft.sources

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

/**
 * CONCURRENT-READER SOAK of the producer protocol (r16): the
 * randomized replay/tear fuzz pins exactly-once CONTENT between ops;
 * this suite drives the read faces WHILE multi-partition tears and
 * their completing replays are in flight. The log's visibility
 * contract under concurrency is per-partition: a segment is visible
 * the moment its rename lands (rename-atomic — no partial files), rows
 * are write-once (a (partition, offset) never changes value once any
 * reader could have seen it), and every partition is a DENSE offset
 * prefix at every instant. Readers assert all three continuously; the
 * SQL `committed_offsets` procedure is raced too (per-partition
 * positions must be monotone across successive calls).
 */
class GraftLogConcurrentSoakSuite extends SparkSuite {

  private def conf() = spark.sessionState.newHadoopConf()

  private def seedLog(root: String, name: String): String = {
    val dir = s"$root/$name"
    GraftLog.materialize(
      spark.range(0, 6)
        .selectExpr("cast(id % 2 as int) as partition", "id div 2 as offset",
          "cast(id as string) as key", "concat('seed', id) as value"),
      dir)
    dir
  }

  test("bounded readers racing torn multi-partition produce see only write-once dense prefixes") {
    val root = java.nio.file.Files.createTempDirectory("graftlog-csoak").toString
    val dir = seedLog(root, "soak")
    val fs = new Path(dir).getFileSystem(conf())

    // write-once witness: first observation of a (partition, offset)
    // pins its value for every later read by every thread
    val seen = new ConcurrentHashMap[(Int, Long), String]()
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)

    def readerLoop(kind: Int): Runnable = () => {
      try {
        var lastCounts = Map.empty[Int, Long]
        while (!stop.get() && failure.get() == null) {
          val frame = spark.read.format("graftlog").option("path", dir).load()
          val rows = (if (kind == 1)
            frame.filter(col("offset") >= 1) // residual-window face
          else frame)
            .select("partition", "offset", "value").collect()
            .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
          // write-once: no (p, offset) may ever change value
          rows.foreach { case (p, o, v) =>
            val prev = seen.putIfAbsent((p, o), v)
            assert(prev == null || prev == v,
              s"write-once violated at ($p, $o): saw '$v' after '$prev'")
          }
          val byP = rows.groupBy(_._1)
          if (kind != 1) {
            // dense prefix per partition at every instant
            byP.foreach { case (p, rs) =>
              val offs = rs.map(_._2).sorted.toSeq
              assert(offs == (0L until offs.length.toLong).toSeq,
                s"partition $p not a dense prefix: $offs")
            }
            // per-reader monotone growth (no vanishing rows)
            val counts = byP.view.mapValues(_.length.toLong).toMap
            lastCounts.foreach { case (p, n) =>
              assert(counts.getOrElse(p, 0L) >= n,
                s"partition $p shrank: ${counts.get(p)} after $n")
            }
            lastCounts = counts
          }
        }
      } catch {
        case t: Throwable => failure.compareAndSet(null, t); ()
      }
    }

    val threads = (0 until 3).map { k =>
      val t = new Thread(readerLoop(k), s"glog-soak-reader-$k")
      t.setDaemon(true); t.start(); t
    }

    val rnd = new scala.util.Random(101L)
    val expected = scala.collection.mutable.ArrayBuffer.empty[String]
    expected ++= (0 until 6).map(i => s"seed$i")
    try {
      for (i <- 0 until 10 if failure.get() == null) {
        val k = 4 + rnd.nextInt(5)
        val parts = 2 + (if (rnd.nextInt(4) == 0) 1 else 0)
        val batch = spark.range(0, k.toLong)
          .selectExpr(s"cast(id % $parts as int) as partition",
            s"concat('b$i-', id) as key", s"concat('b$i-', id) as value")
        if (rnd.nextInt(10) < 4) {
          // torn first attempt: intent + a random partition subset lands
          val bases = GraftLog.latestOffsets(dir, conf())
          fs.mkdirs(new Path(dir, "_producer/default"))
          val out = fs.create(new Path(dir, s"_producer/default/$i.intent"), true)
          out.write(GraftLog.offsetsToJson(bases).getBytes("UTF-8")); out.close()
          val subset = (0 until parts).filter(_ => rnd.nextBoolean())
          if (subset.nonEmpty)
            GraftLog.append(
              batch.filter(col("partition").isin(subset.map(Int.box): _*)), dir)
        }
        GraftLog.appendBatch(batch, dir, batchId = i.toLong)
        expected ++= (0 until k).map(j => s"b$i-$j")
      }
      Thread.sleep(250) // let readers race the settled tail
    } finally {
      stop.set(true)
      threads.foreach(_.join(30000))
    }
    if (failure.get() != null) throw failure.get()

    // settled content is the exactly-once multiset, dense per partition
    val rows = spark.read.format("graftlog").option("path", dir).load()
      .select("partition", "offset", "value").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._3).sorted.toSeq === expected.sorted.toSeq)
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length)
  }

  test("committed_offsets positions are monotone while a producer commits concurrently") {
    val root = java.nio.file.Files.createTempDirectory("graftlog-csoak2").toString
    val dir = seedLog(root, "obs")
    spark.conf.set("spark.sql.catalog.gsoak", classOf[GraftLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsoak.root", root)

    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    val observer = new Thread(() => {
      try {
        var last = Map.empty[Int, Long]
        while (!stop.get() && failure.get() == null) {
          val now = spark.sql(
            "CALL gsoak.system.committed_offsets(`table` => 'obs')")
            .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
          last.foreach { case (p, o) =>
            assert(now.getOrElse(p, -1L) >= o,
              s"committed_offsets went backwards on $p: ${now.get(p)} after $o")
          }
          last = now
        }
      } catch {
        case t: Throwable => failure.compareAndSet(null, t); ()
      }
    }, "glog-soak-observer")
    observer.setDaemon(true); observer.start()

    try {
      for (i <- 0 until 8 if failure.get() == null) {
        GraftLog.appendBatch(
          spark.range(0, 6)
            .selectExpr("cast(id % 2 as int) as partition",
              s"concat('o$i-', id) as key", s"concat('o$i-', id) as value"),
          dir, batchId = i.toLong)
      }
    } finally {
      stop.set(true)
      observer.join(30000)
    }
    if (failure.get() != null) throw failure.get()
    // positions are NEXT-WRITE positions: 3 seed + 8 batches × 3 = 27
    val finalOff = spark.sql(
      "CALL gsoak.system.committed_offsets(`table` => 'obs')")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(finalOff === Map(0 -> 27L, 1 -> 27L), finalOff.toString)
  }
}
