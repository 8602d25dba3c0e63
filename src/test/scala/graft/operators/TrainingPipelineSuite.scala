package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Invariants of the composed curation pipeline that the numeric oracle
  * (pipeline_curate) can't express: per-stage set containment, held-out
  * exclusion, dedup uniqueness, and decontamination completeness. */
class TrainingPipelineSuite extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val bench = docs.filter(col("doc_id") % 97 === 0)
  private lazy val corpus = docs.filter(col("doc_id") % 97 =!= 0)

  test("quality gate only removes rows and keeps the input schema") {
    val gated = TrainingPipeline.qualityGate(corpus, CurationConfig())
    assert(gated.columns.sameElements(corpus.columns))
    assert(gated.count() <= corpus.count())
    // gated rows are a subset of the input
    assert(gated.join(corpus, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("dedup keepers are unique per content and lowest-id") {
    val keepers = TrainingPipeline.dedupKeepers(corpus)
    val perText = keepers.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(perText === 0, "one keeper per distinct text")
    // every keeper is the min doc_id of its duplicate set in the input
    val expected = corpus.groupBy(md5(col("text")).as("f"))
      .agg(min(col("doc_id")).as("doc_id"))
    assert(keepers.select("doc_id").exceptAll(expected.select("doc_id")).count() === 0)
    assert(expected.count() === keepers.count())
  }

  test("decontaminated output shares zero shingles with the benchmark") {
    val clean = TrainingPipeline.decontaminate(corpus, bench)
    val shingle = Dedup.shinglesExpr
    def sh(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", split(col("text"), " "))
      .select(explode(shingle).as("shingle")).distinct()
    assert(sh(clean).join(sh(bench), "shingle").count() === 0)
    // and it only removed rows, never invented them
    assert(clean.join(corpus, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("fuzzy decontamination drops near-duplicates of benchmark docs, keeps far docs") {
    import spark.implicits._
    val benchText = ('a' to 't').map(c => s"tok$c").mkString(" ") // 20 tokens
    val nearDup = benchText.replace("tokt", "changed")            // 19/20 shared
    val far = (1 to 20).map(i => s"other$i").mkString(" ")
    val corpus = Seq((1L, benchText), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val ids = Dedup.fuzzyContaminatedIds(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    // the exact copy MUST be caught (all bands equal); the near-dup's
    // catch is banding-dependent but DETERMINISTIC (fixed strings, md5)
    // — pinned to the measured outcome so a banding change surfaces
    assert(ids.contains(1L), s"exact benchmark copy not flagged: $ids")
    assert(!ids.contains(3L), s"unrelated doc flagged: $ids")
    assert(ids.contains(2L),
      s"near-duplicate (J=16/20 shingles) missed by 4-band minhash: $ids")
  }

  test("curateFull: exclusions, annotations, and stage containment hold") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = TrainingPipeline.curateFull(docs, emb, bench)
    val rows = out.collect()
    // benchmark docs never surface
    assert(rows.forall(_.getLong(0) % 97 != 0))
    // output ⊆ corpus by id; one row per doc
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // split/quintile annotation domains
    assert(rows.forall(r => Set("train", "valid", "test")(r.getString(6))))
    assert(rows.forall(r => (0 to 4).contains(r.getInt(7))))
    // exact dedup held: fingerprints are unique in the output
    assert(rows.map(_.getString(5)).distinct.length === rows.length)
    // semantic dedup held: no output id is in the corpus-wide dropped set
    val dropped = Similarity.semanticDropped(emb.select("vec_id", "embedding"))
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !dropped(r.getLong(0))))
    // semantic DECONTAMINATION held: no output doc sits within τ of a
    // benchmark embedding (the paraphrase-leakage hole stage 7b closes)
    val semContam = Similarity.semanticContaminatedIds(emb, bench)
      .collect().map(_.getLong(0)).toSet
    assert(semContam.nonEmpty, "fixture should surface semantic contamination")
    assert(rows.forall(r => !semContam(r.getLong(0))),
      "a semantically contaminated doc survived curation")
    // quintiles are balanced to ±1 doc (the prefix-sum rank contract)
    val byQ = rows.groupBy(_.getInt(7)).view.mapValues(_.length)
    if (rows.length >= 5) {
      assert(byQ.values.max - byQ.values.min <= 1, byQ.toMap.toString)
    }
    // PII redaction held: no digits survive in any fingerprinted text —
    // verify via a recomputed pipeline prefix (cut → redact) fingerprint
    val trainable = docs.filter(col("doc_id").isNotNull)
      .join(bench.select("doc_id"), Seq("doc_id"), "left_anti")
    // the pipeline prefix: span cut → boilerplate strip → redaction
    val redacted = Search.stripBoilerplate(
        Dedup.spanCut(trainable)
          .drop("n_tokens", "n_cut_tokens")
          .withColumnRenamed("text_clean", "text"))
      .withColumn("text", Redaction.redactColumn(col("text")))
    assert(redacted.filter(col("text").rlike("[0-9]")).count() === 0)
    // Gopher gate held: every surviving ENGLISH doc passes the battery
    // on its post-cut post-redaction text (non-English rows bypass)
    val enSurvivors = out.filter(col("lang") === "en").select("doc_id")
    val failing = TextAnalysis.gopherSignals(
        redacted.join(enSurvivors, "doc_id"))
      .filter(!TextAnalysis.gopherPassCol).count()
    assert(failing === 0L, "an English survivor fails the Gopher battery")
    // DSIR annotation held: present on every row and equal to the
    // standalone operator over the same post-redaction corpus
    assert(rows.forall(!_.isNullAt(8)), "dsir_weight must annotate every row")
    val standalone = ImportanceSelection.dsirWeights(
        redacted, ImportanceSelection.targetSourceCol, scoreTargets = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.forall(r => standalone(r.getLong(0)) == r.getDouble(8)),
      "pipeline dsir_weight diverges from the standalone operator")
  }

  test("streaming curation ingest: gate, redact, and both catalog dedups per micro-batch") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def mkToks(p: String) =
      (for { a <- 'a' to 'f'; b <- 'a' to 'f' } yield s"$p$a$b").take(32)
    val histText = mkToks("h").mkString(" ")
    val nearDup = (mkToks("h").init :+ "zzz").mkString(" ")
    val catText = mkToks("c").mkString(" ")
    val dupText = mkToks("d").mkString(" ")
    val freshPii = (mkToks("f") :+ "12345").mkString(" ")
    val pid = ProcessHandle.current().pid()
    val fpPath = s"${System.getProperty("java.io.tmpdir")}/graft_ing_fp_$pid"
    val bandPath = s"${System.getProperty("java.io.tmpdir")}/graft_ing_band_$pid"
    val (fpTable, bandTable) = ("graft_ing_fp", "graft_ing_band")
    try {
      IncrementalDedup.writeCatalog(Seq(catText).toDF("text"), fpPath, fpTable)
      val history = Seq((100L, histText)).toDF("doc_id", "text")
      IncrementalDedup.writeBandCatalog(history, bandPath, bandTable)
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ListBuffer.empty[(Long, String)]
      val q = TrainingPipeline.curateStreamWriter(
          input.toDS().toDF("doc_id", "text"), fpTable, bandTable, history) { adm =>
          got.synchronized {
            got ++= adm.select("doc_id", "text").as[(Long, String)].collect()
          }; ()
        }.start()
      try {
        input.addData(
          (1L, catText),   // exact catalog dup: dropped
          (2L, nearDup),   // near-dup of band history: dropped
          (3L, "hi there"),// under minTokens: gated
          (40L, dupText), (41L, dupText), // within-batch dup: 40 kept
          (5L, freshPii))  // admitted, digits redacted
        q.processAllAvailable()
        val byId = got.toMap
        assert(byId.keySet === Set(40L, 5L), got.toString)
        assert(!byId(5L).exists(_.isDigit), s"PII survived: ${byId(5L)}")
      } finally q.stop()
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $fpTable")
      spark.sql(s"DROP TABLE IF EXISTS $bandTable")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(fpPath)); rm(new java.io.File(bandPath))
    }
  }

  test("curateIngest closes the epoch loop: repeats across micro-batches become history") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def mkToks(p: String) =
      (for { a <- 'a' to 'f'; b <- 'a' to 'f' } yield s"$p$a$b").take(32)
    val histText = mkToks("h").mkString(" ")
    val textA = mkToks("x").mkString(" ")
    val nearA = (mkToks("x").init :+ "zzz").mkString(" ") // near-dup of A
    val textB = mkToks("y").mkString(" ")
    val pid = ProcessHandle.current().pid()
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_epoch_$pid"
    val (fpTable, bandTable) = ("graft_epoch_fp", "graft_epoch_band")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(base))
    try {
      val history = Seq((100L, histText)).toDF("doc_id", "text")
      IncrementalDedup.writeCatalog(history, s"$base/fp", fpTable)
      IncrementalDedup.writeBandCatalog(history, s"$base/band", bandTable)
      history.write.parquet(s"$base/store")
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ListBuffer.empty[Long]
      val q = TrainingPipeline.curateIngest(
          input.toDS().toDF("doc_id", "text"),
          fpTable, s"$base/fp", bandTable, s"$base/band", s"$base/store") { adm =>
          got.synchronized { got ++= adm.select("doc_id").as[Long].collect() }; ()
        }.start()
      try {
        input.addData((1L, textA))
        q.processAllAvailable()
        // batch 2: an exact repeat of A (new id), a NEAR-dup of A, and a
        // fresh doc — only the fresh doc may pass, because batch 1's
        // append made A history in both catalogs AND the doc store
        input.addData((2L, textA), (3L, nearA), (4L, textB))
        q.processAllAvailable()
        assert(got.sorted.toSeq === Seq(1L, 4L), got.toString)
      } finally q.stop()
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $fpTable")
      spark.sql(s"DROP TABLE IF EXISTS $bandTable")
      rm(new java.io.File(base))
    }
  }

  test("curate excludes every held-out benchmark doc and bounds ranks") {
    val out = TrainingPipeline.curate(docs, bench)
    assert(out.filter(col("doc_id") % 97 === 0).count() === 0)
    val maxRank = out.agg(max("rank")).head.getInt(0)
    assert(maxRank <= CurationConfig().samplePerStratum)
    // ranks are dense from 1 within each stratum
    val holes = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(holes === 0)
  }
}
