package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialization step of the curation pipeline: write the corpus as S
 * balanced parquet shards in deterministic shuffle order — the layout a
 * training job reads (shard = unit of parallel download, in-shard order
 * = training order).
 *
 * Layout contract (what [[graft.operators.Sampling]]'s `export_shards`
 * query reports and ShardedExportSuite asserts on the files):
 *  - shard k holds exactly the docs with ⌊(pos−1)·S / N⌋ = k — contiguous
 *    position ranges, sizes within 1 of N/S, nothing interleaved;
 *  - rows inside each shard file are stored in ascending `pos`, so a
 *    reader streaming one shard sees the training order without sorting.
 *
 * Scale shape: positions come from the distributed prefix-sum
 * decomposition (no global window — see `shuffledPositions`); the write
 * shuffles ONCE, hash-partitioned on the shard id so each of the S
 * writer tasks owns exactly one shard directory (`partitionBy` splits
 * files by value; `repartition(S, shard)` bounds writer memory to one
 * shard's rows); `sortWithinPartitions(pos)` is a partition-local sort —
 * N/S rows per task, never a corpus sort. At 100 TB, S scales with the
 * cluster (shards of a few GB), and the one shuffle is the unavoidable
 * data movement of materializing a permutation.
 */
object ShardedExport {

  /** Corpus rows + their shard assignment, in the export layout's
    * pre-write shape. Exposed for tests and composition. */
  def withShards(s: SparkSession, dir: String, numShards: Int): DataFrame =
    Sampling.shuffledPositions(s, dir)
      .withColumn("shard",
        expr(s"cast(((pos - 1) * $numShards) div total as int)"))
      .drop("total")

  /** Targeted DELETE-BY-ID over a written export — the compliance
    * (right-to-be-forgotten / takedown) pass a training-corpus store
    * must support without rewriting the corpus: probe every file's
    * `doc_id` BLOOM FILTER (written by [[write]]) and rewrite ONLY the
    * files that might contain a requested id; untouched files are not
    * read past their footer, not rewritten, and keep their identity.
    * Rewrites preserve in-file `pos` order (filter keeps order) and go
    * write-aside + atomic rename (the [[graft.ops.Compaction]] stance).
    *
    * Returns (filesProbed, filesRewritten, rowsDeleted). At 100 TB the
    * id list is takedown-sized (a broadcast at most) and the rewrite
    * cost is proportional to the AFFECTED files only — with S balanced
    * shards and one id, ~1 file reads+rewrites instead of S (modulo the
    * ~1% bloom FPP, which costs a wasted probe-read, never a wrong
    * result). */
  def deleteDocs(s: SparkSession, outDir: String, ids: Seq[Long]): (Int, Int, Long) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val conf = s.sessionState.newHadoopConf()
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(outDir))
      .iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    var rewritten = 0
    var deleted = 0L
    files.foreach { p =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(p.toString), conf))
      // ONE footer open serves both the bloom probe and the row count
      val (mightContain, before) =
        try {
          val mc = reader.getFooter.getBlocks.asScala.exists { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == "doc_id") match {
              case Some(cc) if cc.getBloomFilterOffset >= 0 =>
                val bf = reader.readBloomFilter(cc)
                bf == null || ids.exists(id => bf.findHash(bf.hash(id)))
              case _ => true // no bloom ⇒ must assume present
            }
          }
          (mc, reader.getRecordCount)
        } finally reader.close()
      if (mightContain) {
        // ONE data scan per candidate file: the filtered rows write
        // straight to the side location and ITS footer gives `after` —
        // a bloom false positive costs this single pass, a true hit
        // costs exactly the unavoidable rewrite
        val tmp = p.toString + ".rewrite"
        s.read.parquet(p.toString)
          // keep-predicate must pass NULL keys: `!isin` evaluates to NULL
          // for a NULL doc_id and a bare filter would silently delete
          // unrelated null-keyed rows on a takedown
          .filter(col("doc_id").isNull || !col("doc_id").isin(ids: _*))
          // keep the bloom contract: the rewritten file must stay
          // probe-able for the NEXT takedown
          .coalesce(1).write.mode(SaveMode.Overwrite)
          .option("parquet.bloom.filter.enabled#doc_id", "true")
          .option("parquet.bloom.filter.expected.ndv#doc_id",
            math.max(1L, before).toString)
          .parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val after = {
          val r = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(part.toString), conf))
          try r.getRecordCount finally r.close()
        }
        if (after < before) {
          java.nio.file.Files.move(part.toPath, p,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          // the local FS keeps sibling .crc checksums — a stale one
          // fails every future read of the replaced file
          java.nio.file.Files.deleteIfExists(
            p.resolveSibling("." + p.getFileName.toString + ".crc"))
          rewritten += 1
          deleted += before - after
        }
        new java.io.File(tmp).listFiles().foreach(_.delete())
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
      }
    }
    (files.length, rewritten, deleted)
  }

  /** Write `<outDir>/shard=<k>/…parquet`, one balanced shard per
    * directory, rows in ascending `pos` within each file.
    *
    * Each file also carries a PARQUET BLOOM FILTER on `doc_id`: the
    * export is what downstream audits point-probe ("which shard holds
    * doc X", dedup back-references, deletion requests) — with S shards
    * a probe without blooms opens S files; with them it reads S footers
    * and opens ~1. Footer presence is suite-asserted, and the ~1%-FPP
    * default sizing is bounded by `ndv` = the shard's row count. */
  def write(s: SparkSession, dir: String, outDir: String,
      numShards: Int = Sampling.NumShards): Unit = {
    // ndv only needs an upper bound — take the row count from the SOURCE
    // parquet footers (a metadata read), never by materializing the
    // whole shuffle pipeline a second time
    val baseRows = s.read.parquet(s"$dir/documents.parquet").count()
    val ndvPerShard = math.max(1L, baseRows / numShards + 1)
    withShards(s, dir, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", ndvPerShard.toString)
      .partitionBy("shard")
      .parquet(outDir)
  }
}
