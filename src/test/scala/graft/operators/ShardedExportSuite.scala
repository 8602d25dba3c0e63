package graft.operators

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/**
 * File-layout contract of [[ShardedExport]] plus the `export_shards`
 * report's balance arithmetic: balanced contiguous shards, in-shard
 * training order preserved on disk, and report ≡ files.
 */
class ShardedExportSuite extends SparkSuite {

  private val NumShards = Sampling.NumShards

  test("written shards are balanced, contiguous, and ordered by pos on disk") {
    val out = java.nio.file.Files.createTempDirectory("shard-export")
    try {
      ShardedExport.write(spark, sfDir, out.toString)

      // one directory per shard id
      val dirs = new java.io.File(out.toString).listFiles()
        .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
      assert(dirs.length == NumShards, dirs.mkString(","))

      val back = spark.read.parquet(out.toString)
      val n = back.count()

      // balance: every shard within 1 of n/S
      val sizes = back.groupBy("shard").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(sizes.keySet == (0 until NumShards).toSet)
      sizes.values.foreach(c =>
        assert(c >= n / NumShards && c <= n / NumShards + 1, sizes.toString))

      // contiguity: shard ranges partition 1..n without interleaving
      val ranges = back.groupBy("shard")
        .agg(min("pos").as("lo"), max("pos").as("hi"))
        .orderBy("shard").collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(ranges.head._1 == 1L && ranges.last._2 == n)
      ranges.sliding(2).foreach {
        case Array((_, hi0), (lo1, _)) => assert(lo1 == hi0 + 1, ranges.toSeq)
        case _ =>
      }

      // on-disk order: each shard's file(s) store ascending pos (no
      // re-sort — read order is file order for parquet)
      (0 until NumShards).foreach { k =>
        val pos = spark.read.parquet(s"$out/shard=$k")
          .select("pos").collect().map(_.getLong(0))
        assert(pos.sameElements(pos.sorted),
          s"shard $k not stored in training order")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("every shard file carries a readable doc_id parquet bloom filter") {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempDirectory("shard-bloom")
    try {
      ShardedExport.write(spark, sfDir, out.toString)
      val conf = spark.sessionState.newHadoopConf()
      val files = java.nio.file.Files.walk(out).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(files.nonEmpty)
      files.foreach { p =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toString), conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala
          assert(blocks.nonEmpty, s"$p has no row groups")
          blocks.foreach { b =>
            val cc = b.getColumns.asScala
              .find(_.getPath.toDotString == "doc_id")
              .getOrElse(fail(s"$p has no doc_id column chunk"))
            assert(cc.getBloomFilterOffset >= 0,
              s"$p row group missing the doc_id bloom filter")
            assert(reader.readBloomFilter(cc) != null,
              s"$p doc_id bloom filter does not deserialize")
          }
        } finally reader.close()
      }
    } finally {
      java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("deleteDocs removes only the requested ids and rewrites only affected files") {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempDirectory("shard-delete")
    try {
      ShardedExport.write(spark, sfDir, out.toString)
      val before = spark.read.parquet(out.toString)
        .select("doc_id", "pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // pick two ids from ONE shard so the other shards must stay
      // byte-identical
      val shard0 = spark.read.parquet(s"$out/shard=0")
        .select("doc_id").collect().map(_.getLong(0))
      val victims = shard0.take(2).toSeq
      val stamps = java.nio.file.Files.walk(out).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap

      val (probed, rewritten, deleted) =
        ShardedExport.deleteDocs(spark, out.toString, victims)
      assert(probed == stamps.size)
      assert(deleted == victims.length.toLong)
      assert(rewritten >= 1)

      val after = spark.read.parquet(out.toString)
        .select("doc_id", "pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(victims.forall(!after.contains(_)))
      assert(after === before -- victims)

      // untouched shards keep their exact files (bloom skipped them or
      // the filter found nothing; FPP may rewrite a file spuriously but
      // shard 0's files MUST have changed and most files must not)
      val unchanged = stamps.count { case (p, t) =>
        java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(p)).toMillis == t
      }
      assert(unchanged >= stamps.size - rewritten)
      assert(stamps.keys.filter(_.contains("shard=0")).exists { p =>
        java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(p)).toMillis != stamps(p)
      })

      // a second takedown on the REWRITTEN file still works (bloom
      // contract survived the rewrite)
      val victim2 = spark.read.parquet(s"$out/shard=0")
        .select("doc_id").collect().map(_.getLong(0)).head
      val (_, _, deleted2) = ShardedExport.deleteDocs(spark, out.toString, Seq(victim2))
      assert(deleted2 == 1L)
    } finally {
      java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("export_shards report matches the written files") {
    val report = SparkEntry.queries("export_shards")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fromOp = ShardedExport.withShards(spark, sfDir, NumShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(report.toSeq == fromOp.toSeq)
  }
}
