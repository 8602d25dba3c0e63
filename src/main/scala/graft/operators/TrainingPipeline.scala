package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thresholds for the curation gates. Defaults are the standard
  * web-corpus heuristics (Gopher-ish); a deployment tunes per corpus. */
final case class CurationConfig(
    minTokens: Int = 30,
    minDiversity: Double = 0.4,
    maxTopWordRatio: Double = 0.2,
    samplePerStratum: Int = 20)

/**
 * The composed training-data curation pipeline — the user-facing face of
 * the operator family: quality gate → repetition gate → exact-dedup
 * keeper → decontamination → stratified sample, chained as ONE
 * declarative DataFrame plan so Catalyst fuses the narrow stages and the
 * whole flow runs in a single pass over the corpus (plus the two bounded
 * exchanges dedup and sampling inherently need).
 *
 * Stage order is part of the contract (and of the oracle): the held-out
 * benchmark docs leave the corpus FIRST (they must never be trainable,
 * and must not win a dedup-keeper race against a trainable duplicate),
 * then per-row gates, then dedup, then shingle decontamination, then the
 * deterministic sample.
 *
 * 100 TB shape, stage by stage:
 *  - gates: per-row HOFs, zero shuffle, fused into the scan;
 *  - dedup keeper: ONE shuffle on the content fingerprint; the window
 *    partitions by fingerprint, so partition sizes are duplicate-set
 *    sizes (tiny, unskewed) — this is the safe kind of window, unlike a
 *    per-source/per-lang window whose partition count is small;
 *  - decontamination: benchmark shingles BROADCAST (eval suites are
 *    metadata-sized); the contaminated-id set is resolved with a
 *    broadcast semi join and removed with an anti join that AQE sizes
 *    (typically broadcast — contamination is rare);
 *  - sample: the bounded top-k aggregator, ≤k rows per (map partition,
 *    stratum) cross the shuffle — never a per-stratum window funnel.
 */
object TrainingPipeline {

  /** Per-row quality + repetition gates. Narrow: fuses into the scan.
    * Metric definitions are [[TextAnalysis.diversityExpr]] /
    * [[TextAnalysis.topWordRatioExpr]] — shared with the standalone
    * `text_quality` / `text_repetition` queries that document them. */
  def qualityGate(docs: DataFrame, cfg: CurationConfig): DataFrame = {
    val g = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("diversity", TextAnalysis.diversityExpr)
      .withColumn("top_word_ratio", TextAnalysis.topWordRatioExpr)
    g.filter(col("n_tokens") >= cfg.minTokens &&
        col("diversity") >= cfg.minDiversity &&
        col("top_word_ratio") <= cfg.maxTopWordRatio)
      .drop("toks", "n_tokens", "diversity", "top_word_ratio")
  }

  /** Exact-dedup keepers: lowest doc_id per content fingerprint. One
    * fingerprint shuffle; duplicate sets are tiny so the window is
    * skew-free by construction. */
  def dedupKeepers(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("fingerprint")
    docs.withColumn("fingerprint", md5(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .drop("fingerprint", "keeper")
  }

  /** Remove docs sharing any 3-token shingle with the benchmark set.
    * Benchmark shingles broadcast; the corpus never self-joins. Shingles
    * come from [[Dedup.explodeShingles]] — the positional explode the
    * near-dup family's definition prescribes, which never materializes
    * a per-doc shingle array (see its scaladoc for the 4× trap). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    val benchShingles =
      Dedup.explodeShingles(benchmark, Seq.empty).distinct()
    val contaminated =
      Dedup.explodeShingles(docs, Seq("doc_id"))
        .join(broadcast(benchShingles), "shingle")
        .select("doc_id").distinct()
    docs.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Deterministic hash-priority sample, k per stratum, via the bounded
    * top-k aggregator — delegates to [[Sampling.hashPrioritySample]],
    * the one implementation `sample_stratified` also uses. */
  def stratifiedSample(docs: DataFrame, k: Int, stratum: String = "lang"): DataFrame =
    Sampling.hashPrioritySample(docs, stratum, k)

  /** The full pipeline. `benchmark` rows are excluded from the corpus
    * before any other stage (held-out means held out of dedup races
    * too), then gate → dedup → decontaminate → sample. */
  def curate(docs: DataFrame, benchmark: DataFrame,
      cfg: CurationConfig = CurationConfig()): DataFrame = {
    // doc_id is the identity every stage keys on; a NULL id would slip
    // through the anti-join below (null keys never match), so it is
    // excluded explicitly rather than by accident of the join semantics
    val trainable = docs
      .filter(col("doc_id").isNotNull)
      .join(benchmark.select("doc_id"), Seq("doc_id"), "left_anti")
    val gated = qualityGate(trainable, cfg)
    val keepers = dedupKeepers(gated)
    val clean = decontaminate(keepers, benchmark)
    stratifiedSample(clean, cfg.samplePerStratum)
  }

  /** The FULL curation pipeline — every corpus-shaping operator the
    * library ships, composed in the order a production run wants them,
    * returning the curated corpus ANNOTATED for training (not a sample):
    *
    *  1. benchmark exclusion (held-out docs leave before any race);
    *  2. span-level exact dedup ([[Dedup.spanCut]]): duplicated
    *     cross-doc runs are cut, first occurrence kept — BEFORE the
    *     gates, so boilerplate mass doesn't distort quality metrics;
    *  2b. boilerplate n-gram strip ([[Search.stripBoilerplate]]): the
    *     corpus's top-K most frequent 4-grams cut everywhere — after
    *     the span cut (long duplicated RUNS leave first), before
    *     redaction/gates for the same judged-text-is-final-text reason;
    *  3. PII redaction ([[Redaction.redactColumn]]) — the text that
    *     trains is the text that's judged, so gates come after;
    *  4. quality + repetition gates ([[qualityGate]]), then the Gopher
    *     rule battery ([[TextAnalysis.gopherRuleSql]]) — ENGLISH-
    *     calibrated published thresholds, so non-English rows bypass it
    *     (they are judged by the language-agnostic gates only, the way
    *     multilingual pipelines deploy these rules);
    *  5. exact-dedup keepers on the final text ([[dedupKeepers]]);
    *  6. semantic dedup ([[Similarity.semanticDropped]]) over the
    *     CORPUS-WIDE embedding table: a doc whose embedding SemDeDup
    *     prunes leaves — including docs that semantically duplicate a
    *     BENCHMARK doc (their embeddings participate as centrality
    *     evidence), which is near-benchmark contamination leaving by
    *     the same motive as stage 7;
    *  7. shingle decontamination vs the benchmark originals
    *     ([[decontaminate]]), then FUZZY decontamination
    *     ([[Dedup.fuzzyContaminatedIds]]) — rewritten/truncated
    *     benchmark text that exact shingles miss leaves by minhash-band
    *     + verified-Jaccard (≥ 0.5, integer threshold);
    *  7b. SEMANTIC decontamination
    *     ([[Similarity.semanticContaminatedIds]]) — a PARAPHRASED eval
    *     doc shares no shingles (stages 7's screens miss it) and
    *     survives stage 6 whenever the corpus copy is the more central
    *     of the pair; any doc with embedding cosine ≥ SemDecontamTau vs
    *     a benchmark embedding leaves unconditionally (benchmark side
    *     broadcasts — the `decontaminate_embedding` report's pair
    *     definition, shared);
    *  8. annotations: global quality quintile
    *     ([[Sampling.withGlobalQuintile]] — distributed prefix-sum, no
    *     global sort), the leakage-safe content-fingerprint split
    *     ([[Sampling.splitColumn]]), and the DSIR importance weight
    *     ([[ImportanceSelection.dsirWeights]] — the STATISTICAL
    *     target-likeness signal next to the heuristic quintile; bucket
    *     tables build on the post-redaction corpus, every survivor is
    *     scored against them).
    *
    * Output: (doc_id, lang, source, n_tokens, score_fp, fingerprint,
    * split, quintile, dsir_weight) — the audit record a materialization
    * step ([[ShardedExport]]) or a mixer ([[Sampling]]) consumes.
    *
    * 100 TB shape: stages 2-5 and 7-8 are the documented shapes of their
    * operators (one fingerprint exchange + broadcast cut-join; narrow
    * regex; narrow gates; one dedup-keeper exchange; broadcast bench
    * shingles; metadata-sized quintile histogram; narrow split); stage 6
    * shuffles only (vec_id, cell, csim) within cells. Nothing in the
    * chain materializes the corpus more than its operator already does. */
  def curateFull(docs: DataFrame, embeddings: DataFrame, benchmark: DataFrame,
      cfg: CurationConfig = CurationConfig(),
      embCount: Option[Long] = None): DataFrame = {
    val trainable = docs
      .filter(col("doc_id").isNotNull)
      .join(benchmark.select("doc_id"), Seq("doc_id"), "left_anti")
    // boundary: the strip stage consumes this frame THREE times (gram
    // derivation twice inside boilerplateCuts + the join left side) —
    // without the boundary the whole span-cut exchange chain re-executes
    // per consumer (the `redacted`/`clean` boundary rationale, one stage
    // earlier)
    val cut = Dedup.spanCut(trainable)
      .drop("n_tokens", "n_cut_tokens")
      .withColumnRenamed("text_clean", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // corpus-frequency boilerplate strip ([[Search.stripBoilerplate]]):
    // the C4-style cut of the top-K most frequent 4-grams, AFTER the
    // span cut (cross-doc duplicated RUNS leave first, then the
    // still-ubiquitous short template grams) and before redaction/gates
    // for the same reason as stage 2 — judged text is final text
    val stripped = Search.stripBoilerplate(cut)
    // The two multi-consumer boundaries persist (MEMORY_AND_DISK):
    // `redacted` feeds the gate chain AND the DSIR tables, `clean` is
    // scanned by the quintile stage's rank+histogram pair — without the
    // boundaries the span-cut exchange chain re-executes once per
    // consumer (4-6 full corpus passes measured as 93 parquet scans in
    // one plan). No explicit unpersist: the returned frame is lazy, so
    // there is no in-function point after the consumer's action; the
    // ContextCleaner drops the blocks when the frame is unreferenced. A
    // production run materializes this boundary to storage outright
    // (the redacted corpus IS a deliverable) — same cut, durable form.
    //
    // Measured r21 REJECTION — persist → lazy localCheckpoint: the
    // persists embed the whole upstream chain in every consumer's plan
    // (224 parquet scans / 530 exchanges in the initial plan, ~3 s of
    // warm driver-side ANALYSIS per run at sf0.1 — guide §7.3's
    // giant-plan cost), and checkpoints would truncate that. Tried, and
    // REVERTED on measurement: a LogicalRDD boundary carries NO
    // statistics (defaultSizeInBytes), so the joins that AQE/Catalyst
    // broadcast off the persisted frames' known sizes re-planned as
    // shuffles — sw 3.0 -> 11.5 MB (3.8x), sr 3.2 -> 13.1 MB, stages
    // 49 -> 57 at sf0.1, walls within noise (9.6 vs 10.2 s bench A/B,
    // rows identical at sf0.001/0.01/0.1). At scale the join-strategy
    // information is worth far more than the driver analysis time; the
    // durable fix for plan width is the production storage
    // materialization above, which keeps stats AND truncates lineage.
    val redacted = stripped.withColumn("text", Redaction.redactColumn(col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gated = qualityGate(redacted, cfg)
    val battered = TextAnalysis.gopherSignals(gated)
      .filter(col("lang") =!= "en" || TextAnalysis.gopherPassCol)
      .drop(TextAnalysis.gopherSignalCols: _*)
    val keepers = dedupKeepers(battered)
    val semDropped = Similarity.semanticDropped(embeddings, embCount)
      .withColumnRenamed("vec_id", "doc_id")
    val sem = keepers.join(semDropped, Seq("doc_id"), "left_anti")
    val clean = decontaminate(sem, benchmark)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fuzzy stage: `clean` has two consumers here (anti-join left +
    // candidate generation) — the boundary above keeps the span-cut chain
    // from re-executing; `cleanFz` takes one too because the quintile
    // stage's rank+histogram pair scans it twice. The SEMANTIC
    // (embedding) decontamination anti-join rides the same boundary:
    // an eval doc PARAPHRASED into the corpus shares no shingles with
    // the benchmark (both text screens miss it) and survives semantic
    // DEDUP whenever the corpus copy is the more central of the pair —
    // only an embedding-vs-benchmark screen closes that hole. Benchmark
    // embeddings broadcast; ids come from the ONE pair definition the
    // standalone `decontaminate_embedding` report uses.
    val cleanFz = clean
      .join(Dedup.fuzzyContaminatedIds(clean, benchmark),
        Seq("doc_id"), "left_anti")
      .join(Similarity.semanticContaminatedIds(embeddings, benchmark)
        .withColumnRenamed("vec_id", "doc_id"),
        Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = TextAnalysis.qualityRaw(cleanFz)
      .withColumn("score_fp", TextAnalysis.qualityScoreFp)
    val weights = ImportanceSelection
      .dsirWeights(redacted, ImportanceSelection.targetSourceCol,
        scoreTargets = true)
      .select(col("doc_id"), col("weight").as("dsir_weight"))
    Sampling.withGlobalQuintile(scored)
      .withColumn("fingerprint", md5(col("text")))
      .withColumn("split", Sampling.splitColumn(col("fingerprint")))
      .join(weights, Seq("doc_id"), "left")
      .select("doc_id", "lang", "source", "n_tokens", "score_fp",
        "fingerprint", "split", "quintile", "dsir_weight")
  }

  /** Streaming INGEST face of the curation pipeline — the reference's
    * firehose posture applied to data curation: documents arriving on a
    * stream are gated, redacted, and deduplicated against the persisted
    * catalogs per micro-batch (`foreachBatch` — the exact-dedup stage is
    * a stream-static join, but the within-batch keeper window and the
    * fuzzy stage's self-derived id sets need batch planning). Stage
    * functions are the BATCH pipeline's own ([[qualityGate]],
    * [[Redaction.redactColumn]], [[dedupKeepers]],
    * [[IncrementalDedup.dedupAgainstCatalog]] /
    * [[IncrementalDedup.dedupFuzzyAgainstCatalog]]) — one definition per
    * stage across both deployment shapes, so batch backfills and
    * streaming ingest admit identical rows. Gates run on post-redaction
    * text and the fingerprint catalog stores post-redaction
    * fingerprints, matching [[curateFull]]'s ordering. `emit` receives
    * each micro-batch's admitted rows (with their `fingerprint`), ready
    * to append into both catalogs for the next epoch. */
  def curateStreamWriter(
      stream: DataFrame, fpCatalog: String, bandCatalog: String,
      history: DataFrame, cfg: CurationConfig = CurationConfig())(
      emit: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val redacted = batch
        .withColumn("text", Redaction.redactColumn(col("text")))
      val gated = qualityGate(redacted, cfg)
      val keepers = dedupKeepers(gated)
      val fresh = IncrementalDedup.dedupAgainstCatalog(keepers, fpCatalog)
      emit(IncrementalDedup.dedupFuzzyAgainstCatalog(fresh, bandCatalog, history))
    }

  /** [[curateStreamWriter]] with the EPOCH LOOP closed: after emitting a
    * micro-batch's admitted rows, their texts append into the doc store
    * and their fingerprints/bands into both catalogs — so a repeat of
    * this batch's content in ANY later micro-batch (or a batch backfill)
    * is history, including near-duplicates. This is what turns the
    * per-batch keeper window into global dedup: within a batch the
    * window dedupes, across batches the catalogs do. The doc store and
    * both catalog tables must exist before the first batch (bootstrap
    * with [[IncrementalDedup.writeCatalog]] /
    * [[IncrementalDedup.writeBandCatalog]] over the initial history and
    * a parquet write of its texts); the store is re-resolved from its
    * path EVERY batch so earlier batches' appends are visible. */
  def curateIngest(
      stream: DataFrame,
      fpTable: String, fpPath: String,
      bandTable: String, bandPath: String,
      docStorePath: String,
      cfg: CurationConfig = CurationConfig())(
      emit: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val s = batch.sparkSession
      val history = s.read.parquet(docStorePath)
      val redacted = batch
        .withColumn("text", Redaction.redactColumn(col("text")))
      val gated = qualityGate(redacted, cfg)
      val keepers = dedupKeepers(gated)
      val fresh = IncrementalDedup.dedupAgainstCatalog(keepers, fpTable)
      // EAGER localCheckpoint, not persist: the appends below refresh the
      // catalog/store relations, which INVALIDATES any cached plan that
      // references them — a persisted `admitted` would silently RECOMPUTE
      // against the just-grown fp catalog and erase itself before the
      // band append (observed: zero band rows ever landed). Checkpointing
      // truncates the lineage to the materialized rows, so the appends
      // cannot re-derive them.
      val admitted = IncrementalDedup
        .dedupFuzzyAgainstCatalog(fresh, bandTable, history)
        .localCheckpoint()
      emit(admitted)
      admitted.select("doc_id", "text").write.mode("append").parquet(docStorePath)
      IncrementalDedup.appendCatalog(admitted, fpPath, fpTable)
      IncrementalDedup.appendBandCatalog(admitted, bandPath, bandTable)
    }

  // The oracle interpolates THESE defaults — a tuned CurationConfig and
  // its SQL twin can't silently diverge.
  private val Defaults = CurationConfig()

  /** Oracle-gated query: the whole pipeline on the documents table with
    * the deterministic `doc_id % 97 = 0` benchmark stand-in (same as
    * `decontaminate_overlap`). The full table goes to `curate` — its own
    * anti-join performs the held-out exclusion the oracle's `% 97 <> 0`
    * expresses. */
  private val pipelineCurate = QueryDef(
    (s, dir) => {
      val docs = Tables.documentsSpread(s, dir)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      curate(docs, bench).orderBy("lang", "rank")
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |gated AS (
      |  SELECT * FROM (
      |    SELECT doc_id, lang, text, toks, n_tokens,
      |      len(list_distinct(toks)) / CAST(n_tokens AS DOUBLE) AS diversity,
      |      list_max(list_transform(list_distinct(toks),
      |        d -> len(list_filter(toks, x -> x = d)))) / CAST(n_tokens AS DOUBLE) AS twr
      |    FROM t WHERE doc_id % 97 <> 0)
      |  WHERE n_tokens >= ${Defaults.minTokens}
      |    AND diversity >= ${Defaults.minDiversity}
      |    AND twr <= ${Defaults.maxTopWordRatio}),
      |keepers AS (
      |  SELECT doc_id, lang, toks FROM (
      |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      |    FROM gated)
      |  WHERE doc_id = keeper),
      |shingled AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(toks) < 3 THEN []
      |         ELSE list_distinct(list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh
      |  FROM keepers),
      |bench AS (
      |  SELECT DISTINCT unnest(
      |    CASE WHEN len(toks) < 3 THEN []
      |         ELSE list_distinct(list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END) AS shingle
      |  FROM t WHERE doc_id % 97 = 0),
      |contaminated AS (
      |  SELECT DISTINCT doc_id
      |  FROM (SELECT doc_id, unnest(sh) AS shingle FROM shingled) c
      |  JOIN bench USING (shingle)),
      |clean AS (
      |  SELECT doc_id, lang FROM shingled
      |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      |ranked AS (
      |  SELECT lang, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY lang
      |           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), doc_id) AS rn
      |  FROM clean)
      |SELECT lang, CAST(rn AS INT) AS rank, doc_id
      |FROM ranked WHERE rn <= ${Defaults.samplePerStratum}
      |ORDER BY lang, rank""".stripMargin))

  /** Oracle-gated query over [[curateFull]]: the whole extended pipeline
    * with the `doc_id % 97 = 0` benchmark stand-in. The SQL twin is
    * COMPOSED from the per-operator fragments each stage already
    * verifies in isolation ([[Dedup.spanCutSqlCtes]],
    * [[Search.boilerplateSqlCtes]],
    * [[Redaction.redactSql]], [[TextAnalysis.gopherSignalsSql]] +
    * [[TextAnalysis.gopherPassPredSql]],
    * [[Similarity.semanticDroppedSqlCtes]],
    * [[Dedup.shinglesSql]], [[Dedup.fuzzyCandSqlCtes]] +
    * [[Dedup.fuzzyThresholdSql]], [[Sampling.splitSql]]) — one
    * definition per stage on each engine, so a stage change re-verifies
    * the composition automatically. */
  private val pipelineCurateFull = QueryDef(
    (s, dir) => {
      val docs = Tables.documentsSpread(s, dir)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      curateFull(docs, Tables.embeddingsSpread(s, dir), bench,
        embCount = Some(Similarity.embeddingsCountFor(s, dir)))
        .orderBy("doc_id")
    },
    Some(s"""WITH corpus AS (
      |  SELECT doc_id, lang, source, text FROM documents
      |  WHERE doc_id % 97 <> 0),
      |${Dedup.spanCutSqlCtes("corpus", Seq("lang", "source"))},
      |spstr AS (
      |  SELECT doc_id, lang, source, text_clean AS text FROM spclean),
      |${Search.boilerplateSqlCtes("spstr", Seq("lang", "source"))},
      |red AS (
      |  SELECT doc_id, lang, source,
      |         ${Redaction.redactSql("text_clean")} AS text
      |  FROM bsclean),
      |${ImportanceSelection.dsirSqlCtes("red", scoreTargets = true)},
      |rt AS (
      |  SELECT doc_id, lang, source, text, string_split(text, ' ') AS toks,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM red),
      |gated AS (
      |  SELECT doc_id, lang, source, text, toks, n_tokens FROM (
      |    SELECT doc_id, lang, source, text, toks, n_tokens,
      |      len(list_distinct(toks)) / CAST(n_tokens AS DOUBLE) AS diversity,
      |      list_max(list_transform(list_distinct(toks),
      |        d -> len(list_filter(toks, x -> x = d)))) / CAST(n_tokens AS DOUBLE) AS twr
      |    FROM rt)
      |  WHERE n_tokens >= ${Defaults.minTokens}
      |    AND diversity >= ${Defaults.minDiversity}
      |    AND twr <= ${Defaults.maxTopWordRatio}),
      |gop AS (
      |  SELECT doc_id, lang, source, text, toks, n_tokens FROM (
      |  ${TextAnalysis.gopherSignalsSql("gated", "doc_id, lang, source, text, toks, n_tokens")})
      |  WHERE lang <> 'en' OR (${TextAnalysis.gopherPassPredSql})),
      |keepers AS (
      |  SELECT doc_id, lang, source, text, toks, n_tokens FROM (
      |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      |    FROM gop)
      |  WHERE doc_id = keeper),
      |${Similarity.semanticDroppedSqlCtes},
      |sem AS (
      |  SELECT * FROM keepers
      |  WHERE doc_id NOT IN (SELECT vec_id FROM dropped)),
      |bt AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE doc_id % 97 = 0),
      |bench AS (
      |  SELECT DISTINCT unnest(${Dedup.shinglesSql}) AS shingle FROM bt),
      |contaminated AS (
      |  SELECT DISTINCT c.doc_id FROM (
      |    SELECT doc_id, unnest(${Dedup.shinglesSql}) AS shingle FROM sem) c
      |  JOIN bench USING (shingle)),
      |clean AS (
      |  SELECT * FROM sem
      |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      |fbench AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
      |${Dedup.fuzzyCandSqlCtes("clean", "fbench")},
      |fzclean AS (
      |  SELECT * FROM clean WHERE doc_id NOT IN (
      |    SELECT doc_id FROM fzcand WHERE ${Dedup.fuzzyThresholdSql})),
      |${Similarity.semContamSqlCtes},
      |szclean AS (
      |  SELECT * FROM fzclean WHERE doc_id NOT IN (
      |    SELECT doc_id FROM semcontam)),
      |q AS (
      |  SELECT doc_id, lang, source, text, n_tokens,
      |    ${TextAnalysis.scoreFpSql} AS score_fp
      |  FROM szclean),
      |rk AS (
      |  SELECT doc_id, lang, source, n_tokens, score_fp,
      |         md5(text) AS fingerprint,
      |         row_number() OVER (ORDER BY score_fp, doc_id) - 1 AS rr,
      |         COUNT(*) OVER () AS total
      |  FROM q)
      |SELECT doc_id, lang, source, rk.n_tokens AS n_tokens, score_fp, fingerprint,
      |  ${Sampling.splitSql("fingerprint")} AS split,
      |  CAST((rr * 5) // total AS INT) AS quintile,
      |  w.weight AS dsir_weight
      |FROM rk LEFT JOIN dsirw w USING (doc_id) ORDER BY doc_id""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "pipeline_curate" -> pipelineCurate,
    "pipeline_curate_full" -> pipelineCurateFull)
}
