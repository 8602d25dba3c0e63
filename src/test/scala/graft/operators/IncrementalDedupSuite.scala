package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The bucketed-catalog invariant: the historical fingerprint index is
  * the join's big side and must be read in place — no Exchange, no Sort
  * above its scan — while only the new batch shuffles. */
class IncrementalDedupSuite extends SparkSuite {

  private def walk = flattenPlan _ // shared AQE-aware walk (SparkSuite)

  test("catalog side of the anti join is bucket-scanned with no exchange") {
    val df = SparkEntry.queries("dedup_incremental")(spark, sfDir)
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    val smj = nodes.collectFirst {
      case j: SortMergeJoinExec => j
    }.getOrElse(fail("expected a SortMergeJoin, got:\n" +
      df.queryExecution.executedPlan.toString.take(3000)))
    val right = walk(smj.right)
    val scan = right.collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no file scan under the catalog side"))
    assert(scan.bucketedScan, "catalog scan must use its buckets")
    assert(!right.exists(_.isInstanceOf[Exchange]),
      "catalog side must not re-shuffle:\n" + smj.right.toString.take(2000))
    // NOTE a partition-local SortExec remains on the catalog side: since
    // Spark 3.0 bucketed scans don't report the bucket files' sort order
    // (spark.sql.legacy.bucketedTableScan.outputOrdering defaults off),
    // so the SMJ re-sorts within each bucket. That sort is network-free
    // and spillable — the property that matters at catalog scale is the
    // elided Exchange asserted above. Flipping the legacy conf would
    // elide the sort too (single file per bucket), at the cost of
    // one-partition-per-bucket reads.
    // the batch side DOES shuffle — to the catalog's bucket count
    assert(walk(smj.left).exists(_.isInstanceOf[Exchange]),
      "new batch shuffles to the catalog layout")
  }

  test("evens are eliminated by the catalog; survivors keep their schema") {
    val out = SparkEntry.queries("dedup_incremental")(spark, sfDir)
    val evens = out.filter(col("doc_id") % 2 === 0).count()
    assert(evens === 0, "every even doc's fingerprint is in the catalog")
    val docs = Tables.documents(spark, sfDir)
    val odds = docs.filter(col("doc_id") % 2 === 1).count()
    // odd docs survive unless they duplicate an even's text
    assert(out.count() <= odds)
    assert(out.columns.toSeq === Seq("doc_id", "fingerprint", "lang"))
  }

  test("fuzzy face: band catalog bucket-scanned with no exchange; evens self-eliminate") {
    val df = SparkEntry.queries("dedup_incremental_fuzzy")(spark, sfDir)
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    // the band join is the SMJ whose right side scans the bucketed band
    // catalog (the anti/fetch joins are hash joins on ids)
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
      .find(j => walk(j.right).exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("graft_fzcat"))
        case _ => false
      })
      .getOrElse(fail("expected a SortMergeJoin over the band catalog, got:\n" +
        df.queryExecution.executedPlan.toString.take(3000)))
    val right = walk(smj.right)
    val scan = right.collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no file scan under the band-catalog side"))
    assert(scan.bucketedScan, "band catalog scan must use its buckets")
    assert(!right.exists(_.isInstanceOf[Exchange]),
      "band catalog side must not re-shuffle:\n" + smj.right.toString.take(2000))
    // contract: every even (in-catalog) doc collides with itself at
    // J = 1 and is eliminated
    val out = df.collect()
    assert(!out.exists(_.getLong(0) % 2 == 0), "an in-catalog doc survived")
    assert(out.map(_.getLong(0)).forall(_ % 2 == 1))
  }

  test("fuzzy streaming face agrees with the batch face per micro-batch") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fzcat_stream_$pid"
    val table = "graft_fzcat_stream"
    try {
      // history: one 20-token doc; near-dup (19/20 tokens) must be
      // dropped by the ingest, unrelated text must pass
      val histText = ('a' to 't').map(c => s"tok$c").mkString(" ")
      val history = Seq((100L, histText)).toDF("doc_id", "text")
      IncrementalDedup.writeBandCatalog(history, path, table)
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ListBuffer.empty[Long]
      val q = IncrementalDedup.dedupFuzzyStreamWriter(
          input.toDS().toDF("doc_id", "text"), table, history) { surv =>
          got.synchronized { got ++= surv.select("doc_id").as[Long].collect() }; ()
        }.start()
      try {
        input.addData(
          (1L, histText),                            // exact copy: dropped
          (2L, histText.replace("tokt", "changed")), // near-dup: dropped
          (3L, (1 to 20).map(i => s"other$i").mkString(" "))) // passes
        q.processAllAvailable()
        input.addData((4L, histText), (5L, "tiny doc text here"))
        q.processAllAvailable()
        // doc 5 has < 20 tokens of unrelated text: no band collision
        assert(got.sorted.toSeq === Seq(3L, 5L), got.toString)
      } finally q.stop()
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("band-catalog append is crash-atomic: torn epoch invisible, retry clean") {
    val sparkS = spark
    import sparkS.implicits._
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fzcat_crash_$pid"
    val table = "graft_fzcat_crash"
    try {
      val histText = ('a' to 't').map(c => s"tok$c").mkString(" ")
      IncrementalDedup.writeBandCatalog(
        Seq((100L, histText)).toDF("doc_id", "text"), path, table)
      val newDoc = Seq((200L, (1 to 20).map(i => s"new$i").mkString(" ")))
        .toDF("doc_id", "text")
      // CRASH POINT: band rows written, marker never lands — a fuzzy
      // dedup against the catalog must behave as if the append never ran
      val torn = IncrementalDedup.appendBandCatalogData(newDoc, path, table)
      assert(new java.io.File(s"$path/epoch=$torn").exists())
      val dupOfNew = Seq((300L, (1 to 20).map(i => s"new$i").mkString(" ")))
        .toDF("doc_id", "text")
      assert(IncrementalDedup.dedupFuzzyAgainstCatalog(
        dupOfNew, table, newDoc).count() === 1,
        "a torn band epoch leaked into the fuzzy join")
      // RETRY commits; the duplicate of the appended doc now collides
      IncrementalDedup.appendBandCatalog(newDoc, path, table)
      assert(IncrementalDedup.committedEpochs(spark, path) === Seq(0L, torn))
      assert(IncrementalDedup.dedupFuzzyAgainstCatalog(
        dupOfNew, table, newDoc).count() === 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("a catalog epoch committed MID-STREAM is consulted by later micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_midstream_$pid"
    val table = "graft_fpcat_midstream"
    try {
      IncrementalDedup.writeCatalog(
        Seq((1L, "alpha text")).toDF("doc_id", "text"), path, table)
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ListBuffer.empty[Long]
      val q = IncrementalDedup.dedupStreamAgainstCatalog(
          input.toDS().toDF("doc_id", "text"), table)
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            got.synchronized { got ++= df.select("doc_id").as[Long].collect() }
            ()
        }.start()
      try {
        input.addData((10L, "alpha text"), (11L, "beta text"))
        q.processAllAvailable()
        assert(got.sorted.toSeq === Seq(11L), got.toString)
        // the ingest loop's epoch tick: survivors append MID-STREAM —
        // with a plan-time epoch literal this epoch would be invisible
        // and doc 12 would be wrongly re-admitted forever
        IncrementalDedup.appendCatalog(
          Seq(("beta-fp-owner", md5Hex("beta text"))).toDF("who", "fingerprint"),
          path, table)
        input.addData((12L, "beta text"), (13L, "gamma text"))
        q.processAllAvailable()
        assert(got.sorted.toSeq === Seq(11L, 13L), got.toString)
      } finally q.stop()
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("streaming ingest anti-joins the same catalog per micro-batch") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_stream_$pid"
    val table = "graft_fpcat_stream"
    try {
      IncrementalDedup.writeCatalog(
        Seq("seen one", "seen two").toDF("text"), path, table)
      val input = MemoryStream[(Long, String)]
      val out = IncrementalDedup.dedupStreamAgainstCatalog(
        input.toDS().toDF("doc_id", "text"), table)
      val q = out.writeStream.format("memory").queryName("stream_catalog_dedup")
        .start()
      try {
        input.addData((1L, "seen one"), (2L, "fresh a"), (3L, "seen two"))
        q.processAllAvailable()
        input.addData((4L, "fresh b"), (5L, "seen one"))
        q.processAllAvailable()
        val got = spark.table("stream_catalog_dedup")
          .select("doc_id").as[Long].collect().sorted.toSeq
        assert(got === Seq(2L, 4L),
          "catalog texts are dropped in every micro-batch; fresh ones pass")
      } finally q.stop()
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("streaming ingest with the bloom prefilter agrees with the plain face") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_sbloom_$pid"
    val table = "graft_fpcat_sbloom"
    try {
      IncrementalDedup.writeCatalog(
        Seq("seen one", "seen two").toDF("text"), path, table)
      val bloom = IncrementalDedup.catalogBloom(spark, table)
      val input = MemoryStream[(Long, String)]
      val out = IncrementalDedup.dedupStreamAgainstCatalogBloom(
        input.toDS().toDF("doc_id", "text"), table, bloom)
      val q = out.writeStream.format("memory").queryName("stream_catalog_bloom")
        .start()
      try {
        input.addData((1L, "seen one"), (2L, "fresh a"), (3L, "seen two"))
        q.processAllAvailable()
        input.addData((4L, "fresh b"), (5L, "seen one"))
        q.processAllAvailable()
        val got = spark.table("stream_catalog_bloom")
          .select("doc_id").as[Long].collect().sorted.toSeq
        assert(got === Seq(2L, 4L),
          "bloom face: catalog texts dropped every micro-batch, fresh pass")
      } finally q.stop()
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("an EMPTY catalog's bloom keeps the whole batch — nothing silently drops") {
    // BloomFilterAggregate returns null over zero rows; a null bloom
    // literal would null out might_contain and BOTH filter branches
    // would drop every row. catalogBloom builds the always-no filter
    // explicitly instead.
    val sparkS = spark
    import sparkS.implicits._
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_empty_$pid"
    val table = "graft_fpcat_empty"
    try {
      IncrementalDedup.writeCatalog(Seq.empty[String].toDF("text"), path, table)
      val bloom = IncrementalDedup.catalogBloom(spark, table)
      val batch = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      val kept = IncrementalDedup.dedupAgainstCatalogBloom(batch, table, bloom)
      assert(kept.count() === 2L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("bloom prefilter: identical output, shrunken anti-join probe side") {
    val out = SparkEntry.queries("dedup_incremental_bloom")(spark, sfDir)
    val plain = SparkEntry.queries("dedup_incremental")(spark, sfDir)
    // output-equivalence: a Bloom "no" is exact and the anti-join removes
    // every false positive, so the two paths agree row-for-row
    assert(out.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(out).count() === 0)
    // the prefilter is IN the plan (a might_contain predicate)...
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), planStr.take(2000))
    // ...and it genuinely bypasses: far fewer rows reach the anti-join
    // than the batch holds. Probe a scratch catalog's bloom directly.
    val docs = Tables.documents(spark, sfDir)
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_bloomchk_$pid"
    val table = "graft_fpcat_bloomchk"
    try {
      IncrementalDedup.writeCatalog(
        docs.filter(col("doc_id") % 2 === 0), path, table)
      val bloom = IncrementalDedup.catalogBloom(spark, table)
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.graft.Shim
      import org.apache.spark.sql.types.BinaryType
      val mc = Shim.column(new BloomFilterMightContain(
        Literal(bloom, BinaryType),
        Shim.expression(xxhash64(md5(col("text"))))))
      val total = docs.count()
      val candidates = docs.filter(mc).count()
      val evens = docs.filter(col("doc_id") % 2 === 0).count()
      // every true duplicate must pass the filter (no false negatives)
      assert(candidates >= evens)
      // and the definitely-new bypass is real: candidate mass ≈ dup mass,
      // nowhere near the whole batch (1% fpp ⇒ a sliver above evens)
      assert(candidates < total,
        s"prefilter excluded nothing: $candidates of $total")
      assert(candidates - evens <= math.max(10L, (total - evens) / 10),
        s"false-positive sliver too fat: $candidates candidates, $evens true dups")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("appending a deduped batch keeps the catalog usable for the next run") {
    val docs = Tables.documents(spark, sfDir)
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_suite_$pid"
    val table = "graft_fpcat_suite"
    try {
      IncrementalDedup.writeCatalog(
        docs.filter(col("doc_id") < 100), path, table)
      val survivors = IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id") >= 100), table)
      // round 2: survivors' fingerprints appended with the same spec
      IncrementalDedup.appendCatalog(survivors, path, table)
      // now the SAME batch fully deduplicates against the grown catalog
      val round2 = IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id") >= 100), table)
      assert(round2.count() === 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("compacting the catalog folds epochs into one; the join face is unchanged") {
    val docs = Tables.documents(spark, sfDir)
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_fold_$pid"
    val table = "graft_fpcat_fold"
    try {
      IncrementalDedup.writeCatalog(
        docs.filter(col("doc_id") < 100), path, table)
      val b1 = IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id").between(100, 199)), table)
      IncrementalDedup.appendCatalog(b1, path, table)
      val b2 = IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id").between(200, 299)), table)
      IncrementalDedup.appendCatalog(b2, path, table)
      val prints = IncrementalDedup.committedTable(spark, table)
        .collect().map(_.getString(0)).sorted.toSeq
      assert(IncrementalDedup.committedEpochs(spark, path) === Seq(0L, 1L, 2L))

      val folded = IncrementalDedup.compactCatalog(spark, path, table)
      assert(folded === Some(3L))
      assert(IncrementalDedup.committedEpochs(spark, path) === Seq(3L))
      // the fingerprint set is byte-identical through the fold
      val after = IncrementalDedup.committedTable(spark, table)
        .collect().map(_.getString(0)).sorted.toSeq
      assert(after === prints)
      // the join face still fully deduplicates everything already seen
      assert(IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id") < 300), table).count() === 0)
      // and the next append continues the dense range past the fold
      val b3 = IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id").between(300, 349)), table)
      IncrementalDedup.appendCatalog(b3, path, table)
      assert(IncrementalDedup.committedEpochs(spark, path) === Seq(3L, 4L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  test("catalog append is crash-atomic: a torn epoch is invisible and swept on retry") {
    val docs = Tables.documents(spark, sfDir)
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_fpcat_crash_$pid"
    val table = "graft_fpcat_crash"
    try {
      IncrementalDedup.writeCatalog(
        docs.filter(col("doc_id") < 100), path, table)
      val before = IncrementalDedup.committedTable(spark, table).count()
      val survivors = IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id") >= 100), table).localCheckpoint()
      assert(survivors.count() > 0)

      // CRASH POINT: data fully written (files on disk, partition in the
      // metastore) but the commit marker never lands
      val torn = IncrementalDedup.appendCatalogData(survivors, path, table)
      assert(new java.io.File(s"$path/epoch=$torn").exists(),
        "torn epoch data must be on disk for the test to mean anything")
      // all-or-nothing: readers see NONE of the torn epoch
      assert(IncrementalDedup.committedTable(spark, table).count() === before,
        "a torn, unmarked epoch leaked into the committed view")
      // and the join face under-dedups exactly as if the append never ran
      assert(IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id") >= 100), table).count() === survivors.count())

      // RETRY: the normal append sweeps the torn files, reuses the same
      // epoch number (it was never committed), and commits
      IncrementalDedup.appendCatalog(survivors, path, table)
      assert(IncrementalDedup.committedEpochs(spark, path) === Seq(0L, torn),
        "retry should commit the previously-torn epoch number")
      // exact count — had the sweep not run, the torn files would double
      // every fingerprint of this batch
      assert(IncrementalDedup.committedTable(spark, table).count() ===
        before + survivors.count())
      assert(IncrementalDedup.dedupAgainstCatalog(
        docs.filter(col("doc_id") >= 100), table).count() === 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }
}
