package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sampling operators for training-data pipelines — the data-mixing face
 * of the LLM-pipeline family (brief §extensions): a mixture recipe
 * ("k documents per language/source/quality bucket") needs per-stratum
 * samples that are DETERMINISTIC (reproducible runs, auditable mixes)
 * and scale-safe (no per-stratum corpus funnel).
 */
object Sampling {

  private val K = 20

  /**
   * Deterministic stratified sample: the K lowest-hash documents per
   * language. Priority = the first 13 hex digits of
   * md5(doc_id-as-string) — 52 bits, so its numeric value is EXACT in a
   * double, and lexicographic hex order equals numeric order, letting
   * the DuckDB twin order by the substring directly while the Spark
   * side aggregates on the converted number. Hash-ordering is the
   * standard reproducible-sample trick: stable under corpus appends
   * (a new doc displaces at most one sampled doc per stratum), unlike
   * `TABLESAMPLE`/`rand()` which reshuffle everything every run.
   *
   * Scale shape: per-stratum top-k runs through the bounded
   * [[graft.functions.TopKAggregator]] — a map-side partial aggregation
   * shuffling AT MOST k rows per (map partition, stratum). The window
   * alternative (`row_number().over(partitionBy(lang))`, the oracle's
   * formulation) funnels every row of a stratum into one reducer task —
   * with a handful of languages over 100 TB that is a handful of tasks
   * sorting the corpus. Strata stay the GROUP key, not the partition
   * count, so low-cardinality strata cost nothing extra.
   */
  /** The ONE implementation of deterministic hash-priority top-k per
    * stratum — shared by `sample_stratified` and the curation pipeline
    * so the hash width, the DESC-negation, and the tie-break can never
    * desync between them. Returns (stratum, rank, doc_id), unordered.
    * The stratum column is grouped BY ITS STRING FORM (any type casts
    * deterministically); its name must not collide with the two output
    * columns this helper mints. */
  def hashPrioritySample(docs: DataFrame, stratum: String, k: Int): DataFrame = {
    require(stratum != "rank" && stratum != "doc_id",
      s"stratum '$stratum' collides with an output column of the sample")
    val s = docs.sparkSession
    import s.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val topk = new TopKAggregator(k).toColumn.name("topk")
    docs.select(col(stratum).cast("string").as("__stratum"), col("doc_id"),
        // negate: the aggregator keeps score DESC, we want LOWEST hash
        (lit(0.0) - expr(
          "cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as double)"))
          .as("prio"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, p) => Scored(id, p) }
      .agg(topk)
      .flatMap { case (st, items) =>
        items.zipWithIndex.map { case (r, i) => (st, i + 1, r.id) }
      }
      .toDF("__stratum", "rank", "doc_id")
      .withColumnRenamed("__stratum", stratum)
  }

  private val sampleStratified = QueryDef(
    (s, dir) =>
      hashPrioritySample(Tables.documentsSpread(s, dir), "lang", K)
        .orderBy("lang", "rank"),
    Some(s"""WITH ranked AS (
      |  SELECT lang, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY lang
      |           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), doc_id) AS rn
      |  FROM documents)
      |SELECT lang, CAST(rn AS INT) AS rank, doc_id
      |FROM ranked WHERE rn <= $K ORDER BY lang, rank""".stripMargin))

  private val TokenBudget = 1000L

  /**
   * Token-budget mixture cutoff: for each source, the hash-priority
   * cutoff that keeps (at most) `TokenBudget` tokens — the other half of
   * data mixing, where the recipe is "N tokens per source", not "N
   * documents per stratum".
   *
   * The naive formulation — `sum(tokens) OVER (PARTITION BY source
   * ORDER BY hash)` then filter — funnels every row of a source into
   * one reducer for the running sum: with a handful of sources over
   * 100 TB, a handful of tasks sort the corpus. This operator is the
   * scale-safe two-level design: docs bucket by their first two
   * priority-hash hex digits (256 buckets), ONE map-side-combined
   * groupBy builds the per-(source, bucket) token histogram, and the
   * cumulative scan + cutoff runs over that histogram — at most
   * 256 rows per source, metadata-sized whatever the corpus. The
   * window below therefore orders buckets, never documents. Kept set =
   * docs whose bucket is AT OR BELOW `cutoff_bucket` (every bucket whose
   * cumulative total fits the budget, boundary bucket included — bucket
   * granularity is the documented resolution; a third pass could refine
   * inside the first bucket past the cutoff, same shape).
   */
  private val mixBudgetCutoff = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.documentsSpread(s, dir)
        .select(col("source"),
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)")
            .as("bucket"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy("source", "bucket")
        .agg(sum(col("n_tokens")).as("bucket_tokens"),
          count(lit(1)).as("bucket_docs"))
      // histogram-sized window: ≤256 rows per source
      val w = Window.partitionBy("source").orderBy("bucket")
      hist
        .withColumn("cum_tokens", sum(col("bucket_tokens")).over(w))
        .filter(col("cum_tokens") <= TokenBudget)
        .groupBy("source")
        .agg(max(col("bucket")).as("cutoff_bucket"),
          max(col("cum_tokens")).as("kept_tokens"),
          sum(col("bucket_docs")).as("kept_docs"))
        .orderBy("source")
    },
    Some(s"""WITH h AS (
      |  SELECT source,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS bucket,
      |         SUM(len(string_split(text, ' '))) AS bucket_tokens,
      |         COUNT(*) AS bucket_docs
      |  FROM documents GROUP BY 1, 2),
      |c AS (
      |  SELECT source, bucket, bucket_docs,
      |         SUM(bucket_tokens) OVER (PARTITION BY source ORDER BY bucket) AS cum_tokens
      |  FROM h)
      |SELECT source, MAX(bucket) AS cutoff_bucket,
      |       CAST(MAX(cum_tokens) AS BIGINT) AS kept_tokens,
      |       CAST(SUM(bucket_docs) AS BIGINT) AS kept_docs
      |FROM c WHERE cum_tokens <= $TokenBudget
      |GROUP BY source ORDER BY source""".stripMargin))

  private val SeqLen = 256L

  /**
   * Sequence packing (concat-and-chunk): assign every document a
   * training-sequence id by concatenating each source's docs in
   * deterministic hash order and chunking the token stream at `SeqLen`.
   * `seq_id = floor(tok_start / SeqLen)` where `tok_start` is the doc's
   * offset in its source's concatenated stream — the standard GPT-style
   * packing recipe, reproducible across runs.
   *
   * The offset is a PREFIX SUM, and the naive form — `sum(tokens) OVER
   * (PARTITION BY source ORDER BY hash)` — funnels each source's whole
   * corpus through one reducer. This is the distributed decomposition:
   *   tok_start = bucket_offset(source, bucket) + intra_bucket_cumsum
   * where bucket = first two hex digits of the priority hash (256-way).
   * The intra-bucket window partitions by (source, bucket) — 256×
   * the parallelism, corpus/256 rows per task — and the bucket offsets
   * come from a map-side-combined histogram whose exclusive-prefix
   * window scans ≤256 metadata rows per source. Broadcast-joining the
   * offsets back costs O(sources × 256). Because the bucket is a prefix
   * of the hash, (bucket, hash) order ≡ hash order, so the decomposed
   * sum equals the single-window sum exactly — which is what the DuckDB
   * twin computes with the naive one-window form.
   */
  private val packSequences = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documentsSpread(s, dir)
        .select(col("source"), col("doc_id"),
          expr("substring(md5(cast(doc_id as string)), 1, 13)").as("prio"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("bucket",
          expr("cast(conv(substring(prio, 1, 2), 16, 10) as int)"))
      val intra = Window.partitionBy("source", "bucket")
        .orderBy("prio", "doc_id")
      val withCum = base.withColumn("cum_in_bucket",
        sum(col("n_tokens")).over(intra))
      val offsets = base.groupBy("source", "bucket")
        .agg(sum(col("n_tokens")).as("bucket_tokens"))
        .withColumn("bucket_offset", coalesce(
          sum(col("bucket_tokens")).over(
            Window.partitionBy("source").orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("source").as("o_source"), col("bucket").as("o_bucket"),
          col("bucket_offset"))
      withCum
        .join(broadcast(offsets),
          col("source") === col("o_source") && col("bucket") === col("o_bucket"))
        .withColumn("tok_start",
          col("bucket_offset") + col("cum_in_bucket") - col("n_tokens"))
        .select(
          col("source"),
          col("doc_id"),
          floor(col("tok_start") / lit(SeqLen.toDouble)).cast("int").as("seq_id"),
          col("tok_start"),
          col("n_tokens").cast("int").as("n_tokens"))
        .orderBy("source", "tok_start")
    },
    Some(s"""WITH d AS (
      |  SELECT source, doc_id,
      |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS prio,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT source, doc_id, n_tokens,
      |         SUM(n_tokens) OVER (PARTITION BY source
      |           ORDER BY prio, doc_id) AS cum
      |  FROM d)
      |SELECT source, doc_id,
      |       CAST(FLOOR((cum - n_tokens) / $SeqLen.0) AS INT) AS seq_id,
      |       CAST(cum - n_tokens AS BIGINT) AS tok_start,
      |       CAST(n_tokens AS INT) AS n_tokens
      |FROM c ORDER BY source, tok_start""".stripMargin))

  /**
   * Mixture reweighting (the upsampling face of data mixing): for each
   * source, the EPOCH FACTOR that equalizes its contribution — how many
   * times to repeat the source so every source contributes the same
   * token share to the mix. epochs = (total/n_sources) / source_tokens:
   * under-represented sources repeat >1×, over-represented <1×
   * (subsample, e.g. via [[mixBudgetCutoff]]'s hash cutoff).
   *
   * Scale shape: ONE map-side-combined groupBy(source) reduces the
   * corpus to a per-source token total; everything after (the global
   * total, the share, the factor) is an unpartitioned window over that
   * METADATA-SIZED aggregate (#sources rows) — the corpus is scanned
   * once and never re-shuffled.
   */
  private val mixEpochs = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy() // #sources rows — metadata, not corpus
      Tables.documentsSpread(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(sum(col("n_tokens")).as("source_tokens"))
        .withColumn("total", sum(col("source_tokens")).over(w))
        .withColumn("n_sources", count(lit(1)).over(w))
        .select(
          col("source"),
          col("source_tokens"),
          // floor-based half-up rounding: Spark round() and DuckDB ROUND
          // disagree on .5 boundaries (see TextAnalysis.quality_score);
          // floor(x*1e4+0.5) is engine-identical on identical doubles
          (floor(col("source_tokens").cast("double") / col("total") * 1e4 + 0.5) / 1e4)
            .as("actual_share"),
          (floor((col("total").cast("double") / col("n_sources")) /
            col("source_tokens") * 1e4 + 0.5) / 1e4).as("epochs"))
        .orderBy("source")
    },
    Some("""WITH per AS (
      |  SELECT source,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS source_tokens
      |  FROM documents GROUP BY source),
      |g AS (
      |  SELECT source, source_tokens,
      |         SUM(source_tokens) OVER () AS total,
      |         COUNT(*) OVER () AS n_sources
      |  FROM per)
      |SELECT source, source_tokens,
      |  FLOOR(CAST(source_tokens AS DOUBLE) / total * 1e4 + 0.5) / 1e4 AS actual_share,
      |  FLOOR((CAST(total AS DOUBLE) / n_sources) / source_tokens * 1e4 + 0.5) / 1e4 AS epochs
      |FROM g ORDER BY source""".stripMargin))

  /** MATERIALIZED epoch mixture — the consumer of [[mixEpochs]]' factor
    * table: every document re-emitted `epochs(source)` times, so the
    * downstream shuffle/pack/export stages see the actual upsampled
    * corpus rather than a recipe. The integer part replicates every doc
    * of the source; the FRACTIONAL part admits each doc independently by
    * a deterministic per-doc hash draw at rate frac — in expectation the
    * source's token share lands exactly on the recipe, and the draw is
    * reproducible (the hash-priority stance: stable under appends,
    * auditable).
    *
    * Determinism across engines: the factor is kept as the SCALED
    * integer e4 = ⌊epochs·10⁴+0.5⌋ (the [[mixEpochs]] rounding, before
    * its inexact /10⁴), so int-part (e4 div 10⁴) and frac (e4 mod 10⁴)
    * are exact BIGINTs; the draw compares a 16-bit md5 nibble value u
    * against it as u·10⁴ < frac·2¹⁶ — pure integer arithmetic, no float
    * compare anywhere. The nibble expression is ONE SQL string valid in
    * both dialects (the [[ImportanceSelection]] bucket precedent).
    *
    * Scale shape: the factor table is #sources rows (ONE map-side-
    * combined groupBy, the [[mixEpochs]] reduction) broadcast back onto
    * the corpus; the per-doc draw and the copy explode are narrow
    * per-row work — the corpus never shuffles, and output volume is the
    * mixture's irreducible row count (≈ corpus size under share
    * equalization). A source with epochs < 1 DOWNSAMPLES via the same
    * fractional draw (int part 0). */
  /** 16-bit per-doc draw — the first 4 nibbles of
    * md5("epoch:" || doc_id) as an integer in [0, 2¹⁶). ONE expression
    * string valid in Spark AND DuckDB SQL (instr/substring/md5 agree —
    * the [[ImportanceSelection]] bucket precedent). */
  private val EpochDrawUSql: String = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substring(md5('epoch:' || CAST(doc_id AS STRING)), $i, 1)) - 1)"
    s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
  }

  private val mixEpochsMaterialize = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy()
      val factors = Tables.documentsSpread(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(sum(col("n_tokens")).as("source_tokens"))
        .withColumn("total", sum(col("source_tokens")).over(w))
        .withColumn("n_sources", count(lit(1)).over(w))
        .select(col("source"),
          floor((col("total").cast("double") / col("n_sources")) /
            col("source_tokens") * 1e4 + 0.5).cast("long").as("e4"))
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"), col("source"))
        .join(broadcast(factors), "source")
        .withColumn("u", expr(EpochDrawUSql))
        .withColumn("n_copies",
          expr("e4 div 10000") +
            when(col("u") * 10000L < (col("e4") % 10000L) * 65536L, 1L).otherwise(0L))
        .filter(col("n_copies") >= 1)
        .withColumn("epoch", explode(sequence(lit(1L), col("n_copies"))))
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy("doc_id", "epoch")
    },
    Some(s"""WITH per AS (
      |  SELECT source,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS source_tokens
      |  FROM documents GROUP BY source),
      |g AS (
      |  SELECT source, source_tokens,
      |         SUM(source_tokens) OVER () AS total,
      |         COUNT(*) OVER () AS n_sources
      |  FROM per),
      |f AS (
      |  SELECT source,
      |         CAST(FLOOR((CAST(total AS DOUBLE) / n_sources)
      |           / source_tokens * 1e4 + 0.5) AS BIGINT) AS e4
      |  FROM g),
      |drawn AS (
      |  SELECT d.doc_id, d.source,
      |         (f.e4 // 10000) +
      |           (CASE WHEN ($EpochDrawUSql) * 10000 < (f.e4 % 10000) * 65536
      |                 THEN 1 ELSE 0 END) AS n_copies
      |  FROM documents d JOIN f USING (source))
      |SELECT doc_id, source, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS epoch
      |FROM drawn WHERE n_copies >= 1
      |ORDER BY doc_id, epoch""".stripMargin))

  // ---- fixed-window document chunking ---------------------------------

  private val ChunkWin = 32
  private val ChunkStride = 24

  /** Split every document into fixed-size OVERLAPPING token windows
    * (window [[ChunkWin]], stride [[ChunkStride]] — the context-window
    * chunking step in front of embedding/training jobs, where long docs
    * must become model-sized pieces without losing cross-boundary
    * context). A doc with n tokens yields `1 + ceil((n−W)/S)` chunks
    * (one if n ≤ W); the last chunk is short rather than padded, and
    * chunk provenance (doc_id, chunk_id) survives for joining features
    * back later.
    *
    * Shape at 100 TB: pure per-row narrow work — split, an explode of
    * the (tiny) chunk-index sequence, and a 1-indexed slice per chunk.
    * Zero shuffle, zero state; output volume is input tokens ×
    * (W/S overlap factor), the irreducible minimum. Spark `slice` and
    * DuckDB `list_slice` index differently (length vs end-inclusive) —
    * the twin spells both to the same window. */
  private val chunkDocuments = QueryDef(
    (s, dir) => {
      val W = ChunkWin
      val S = ChunkStride
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("nc", when(col("n") <= W, lit(1))
          .otherwise(lit(1) + expr(s"(n - $W + ${S - 1}) div $S").cast("int")))
        .withColumn("chunk_id", explode(sequence(lit(0), col("nc") - 1)))
        .select(
          col("doc_id"),
          col("chunk_id"),
          concat_ws(" ",
            slice(col("toks"), col("chunk_id") * S + 1, lit(W))).as("chunk_text"),
          least(lit(W), col("n") - col("chunk_id") * S).as("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_id")
    },
    Some(s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, n,
      |         unnest(range(0, CASE WHEN n <= $ChunkWin THEN 1
      |           ELSE 1 + (n - $ChunkWin + ${ChunkStride - 1}) // $ChunkStride
      |           END)) AS chunk_id
      |  FROM d)
      |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
      |  array_to_string(list_slice(toks, chunk_id * $ChunkStride + 1,
      |    chunk_id * $ChunkStride + $ChunkWin), ' ') AS chunk_text,
      |  CAST(LEAST($ChunkWin, n - chunk_id * $ChunkStride) AS INT)
      |    AS n_chunk_tokens
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin))

  // ---- quality-quintile mixing ----------------------------------------

  /** Partition the corpus into five GLOBAL quality quintiles (the
    * CCNet-style "bucket by model score, then mix buckets" step) and
    * report each bucket's document/token mass and score range.
    *
    * The global rank that defines quintile membership is computed with
    * the DISTRIBUTED PREFIX SUM pattern (as `pack_sequences`): the
    * fixed-point score (an exact BIGINT shared with `text_quality` —
    * one definition, [[TextAnalysis.qualityScoreFp]]) range-buckets into
    * ≤251 ordered slots, ranks are per-slot window work (parallel), and
    * slot offsets come from a metadata-sized histogram — no corpus ever
    * funnels through one reducer for the global ORDER BY the naive
    * `ntile(5)` would need. quintile = rank·5 div N, exactly the
    * oracle's row_number arithmetic. */
  /** Annotate a (…, doc_id, score_fp) frame with its GLOBAL quality
    * quintile via the distributed prefix-sum rank — the ONE quintile
    * definition, shared by `mix_quality_buckets` and the curation
    * pipeline. The fixed-point score range-buckets into ≤251 ordered
    * slots (`score_fp div 40`); ranks are per-slot window work
    * (parallel) and slot offsets come from a metadata-sized histogram —
    * no corpus ever funnels through one reducer for the global ORDER BY
    * a naive `ntile(5)` would need. quintile = rank·5 div N, exactly the
    * oracle's row_number arithmetic. Input columns pass through. */
  private[operators] def withGlobalQuintile(scored0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = scored0.withColumn("qb", expr("cast(score_fp div 40 as int)"))
    val intra = Window.partitionBy("qb").orderBy("score_fp", "doc_id")
    val ranked = scored.withColumn("intra",
      row_number().over(intra).cast("long"))
    // ≤251 rows: the metadata-sized histogram that replaces the
    // global sort (windows below run over it, not the corpus)
    val offs = scored.groupBy("qb").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy("qb").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("total", sum(col("cnt")).over(
        Window.orderBy("qb").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("qb").as("o_qb"), col("off"), col("total"))
    ranked.join(broadcast(offs), col("qb") === col("o_qb"))
      .withColumn("r", col("off") + col("intra") - 1)
      .withColumn("quintile", expr("cast((r * 5) div total as int)"))
      .drop("qb", "intra", "o_qb", "off", "total", "r")
  }

  /** PER-SOURCE quality quintiles — the source-conditional variant of
    * [[withGlobalQuintile]]: quality scores are only comparable WITHIN a
    * source (a clean-reference corpus and a web crawl occupy disjoint
    * score ranges, so a global cut just drops the crawl wholesale);
    * CCNet-style filtering buckets each source against itself. Same
    * prefix-sum discipline, one level deeper: ranks are per-(source,
    * slot) window work (parallel), offsets come from the
    * #sources × ≤251-row histogram (the only per-source windows run
    * over THAT, never the corpus), quintile = rank·5 div source-total.
    * No giant source ever funnels through one reducer. */
  private[operators] def withSourceQuintile(scored0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = scored0.withColumn("qb", expr("cast(score_fp div 40 as int)"))
    val intra = Window.partitionBy("source", "qb").orderBy("score_fp", "doc_id")
    val ranked = scored.withColumn("intra",
      row_number().over(intra).cast("long"))
    val offs = scored.groupBy("source", "qb").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.partitionBy("source").orderBy("qb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy("source").orderBy("qb").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("source").as("o_src"), col("qb").as("o_qb"),
        col("off"), col("total"))
    ranked.join(broadcast(offs),
        col("source") === col("o_src") && col("qb") === col("o_qb"))
      .withColumn("r", col("off") + col("intra") - 1)
      .withColumn("quintile", expr("cast((r * 5) div total as int)"))
      .drop("qb", "intra", "o_src", "o_qb", "off", "total", "r")
  }

  private val mixQualityBySource = QueryDef(
    (s, dir) => {
      val scored = TextAnalysis.qualityRaw(
          Tables.documentsSpread(s, dir))
        .select(col("source"), col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          TextAnalysis.qualityScoreFp.as("score_fp"))
      withSourceQuintile(scored)
        .groupBy("source", "quintile")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
          min("score_fp").as("min_fp"), max("score_fp").as("max_fp"))
        .orderBy("source", "quintile")
    },
    Some(s"""WITH t AS (
      |  SELECT source, doc_id, text, string_split(text, ' ') AS toks,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |q AS (
      |  SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |    ${TextAnalysis.scoreFpSql} AS score_fp
      |  FROM t),
      |r AS (
      |  SELECT source, n_tokens, score_fp,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY score_fp, doc_id) - 1 AS r,
      |         COUNT(*) OVER (PARTITION BY source) AS total
      |  FROM q)
      |SELECT source, CAST((r * 5) // total AS INT) AS quintile,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens,
      |  MIN(score_fp) AS min_fp, MAX(score_fp) AS max_fp
      |FROM r GROUP BY 1, 2 ORDER BY source, quintile""".stripMargin))

  /** The per-source token budget [[mixDomainCap]] enforces — one
    * constant shared by the Spark query and its oracle twin (declared
    * BEFORE the QueryDef: object-init order, a forward reference would
    * interpolate 0 into the SQL). */
  private val DomainCapTokens = 1200L

  /** Per-source token-budget cap — the "domain cap" policy of web-scale
    * curation (RefinedWeb's per-domain limits, Dolma's per-source
    * budgets): within each source, documents are admitted in QUALITY
    * order (score_fp DESC, doc_id as the total tie-break — one shared
    * integer score, [[TextAnalysis.qualityScoreFp]]) until the source's
    * cumulative token count would cross the budget; the crossing doc
    * and everything after it are cut (the prefix rule — deterministic,
    * no knapsack backfill).
    *
    * Scale shape: ONE hash exchange on `source`, then per-source
    * rank + running-sum windows — partition-parallel, no global window,
    * nothing driver-sized. The cut is a filter on the running sum, so
    * the corpus streams through exactly once. */
  private val mixDomainCap = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = TextAnalysis.qualityRaw(
          Tables.documentsSpread(s, dir))
        .select(col("source"), col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          TextAnalysis.qualityScoreFp.as("score_fp"))
      val w = Window.partitionBy("source")
        .orderBy(col("score_fp").desc, col("doc_id"))
      scored
        .withColumn("admit_rank", row_number().over(w).cast("long"))
        .withColumn("cum_tokens", sum("n_tokens").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum_tokens") <= DomainCapTokens)
        .select("source", "admit_rank", "doc_id", "n_tokens",
          "cum_tokens", "score_fp")
        .orderBy("source", "admit_rank")
    },
    Some(s"""WITH t AS (
      |  SELECT source, doc_id, string_split(text, ' ') AS toks,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |q AS (
      |  SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |    ${TextAnalysis.scoreFpSql} AS score_fp
      |  FROM t),
      |r AS (
      |  SELECT source, doc_id, n_tokens, score_fp,
      |    CAST(row_number() OVER (PARTITION BY source
      |         ORDER BY score_fp DESC, doc_id) AS BIGINT) AS admit_rank,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source
      |         ORDER BY score_fp DESC, doc_id
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM q)
      |SELECT source, admit_rank, doc_id, n_tokens, cum_tokens, score_fp
      |FROM r WHERE cum_tokens <= $DomainCapTokens
      |ORDER BY source, admit_rank""".stripMargin))

  private val mixQualityBuckets = QueryDef(
    (s, dir) => {
      val scored = TextAnalysis.qualityRaw(
          Tables.documentsSpread(s, dir))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          TextAnalysis.qualityScoreFp.as("score_fp"))
      withGlobalQuintile(scored)
        .groupBy("quintile")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
          min("score_fp").as("min_fp"), max("score_fp").as("max_fp"))
        .orderBy("quintile")
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS toks,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |    ${TextAnalysis.scoreFpSql} AS score_fp
      |  FROM t),
      |r AS (
      |  SELECT doc_id, n_tokens, score_fp,
      |         row_number() OVER (ORDER BY score_fp, doc_id) - 1 AS r,
      |         COUNT(*) OVER () AS total
      |  FROM q)
      |SELECT CAST((r * 5) // total AS INT) AS quintile,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens,
      |  MIN(score_fp) AS min_fp, MAX(score_fp) AS max_fp
      |FROM r GROUP BY 1 ORDER BY quintile""".stripMargin))

  /** Temperature-flattened mixture shares (the multilingual α-sampling
    * recipe: sampling rate ∝ share^α, α < 1 boosts low-resource sources
    * and shrinks dominant ones). α is FIXED at 0.5: `sqrt` is the one
    * exponent IEEE requires to be correctly rounded, so Spark and DuckDB
    * compute bit-identical adjusted weights — `pow(x, 0.3)` carries no
    * such guarantee and would make the oracle a ULP lottery. The weight
    * sum crosses engines through a fixed-point BIGINT (floor(√p·1e9)):
    * integer sums are order-free where a double sum is not.
    *
    * Scale shape: identical to [[mixEpochs]] — ONE map-side-combined
    * groupBy(source) reduces the corpus; every window below runs over
    * the #sources-row aggregate, never the corpus. */
  private val mixTemperature = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy() // #sources rows — metadata, not corpus
      Tables.documentsSpread(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(sum(col("n_tokens")).as("source_tokens"))
        .withColumn("total", sum(col("source_tokens")).over(w))
        .withColumn("sfp",
          floor(sqrt(col("source_tokens").cast("double") / col("total")) * 1e9)
            .cast("long"))
        .withColumn("sfp_total", sum(col("sfp")).over(w))
        .select(
          col("source"),
          col("source_tokens"),
          (floor(col("source_tokens").cast("double") / col("total") * 1e4 + 0.5) / 1e4)
            .as("actual_share"),
          (floor(col("sfp").cast("double") / col("sfp_total") * 1e4 + 0.5) / 1e4)
            .as("temp_share"),
          // boost from the EXACT intermediates, not the rounded shares
          (floor((col("sfp").cast("double") / col("sfp_total")) /
            (col("source_tokens").cast("double") / col("total")) * 1e4 + 0.5) / 1e4)
            .as("boost"))
        .orderBy("source")
    },
    Some("""WITH per AS (
      |  SELECT source,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS source_tokens
      |  FROM documents GROUP BY source),
      |g AS (
      |  SELECT source, source_tokens,
      |         SUM(source_tokens) OVER () AS total
      |  FROM per),
      |fp AS (
      |  SELECT source, source_tokens, total,
      |         CAST(FLOOR(SQRT(CAST(source_tokens AS DOUBLE) / total) * 1e9)
      |              AS BIGINT) AS sfp
      |  FROM g),
      |t AS (
      |  SELECT source, source_tokens, total, sfp,
      |         SUM(sfp) OVER () AS sfp_total
      |  FROM fp)
      |SELECT source, source_tokens,
      |  FLOOR(CAST(source_tokens AS DOUBLE) / total * 1e4 + 0.5) / 1e4 AS actual_share,
      |  FLOOR(CAST(sfp AS DOUBLE) / sfp_total * 1e4 + 0.5) / 1e4 AS temp_share,
      |  FLOOR((CAST(sfp AS DOUBLE) / sfp_total) /
      |        (CAST(source_tokens AS DOUBLE) / total) * 1e4 + 0.5) / 1e4 AS boost
      |FROM t ORDER BY source""".stripMargin))

  /** DoReMi step size η on the 1e6 fixed-point probability scale: the
    * fixture's per-domain excess sits at 0–350 fp, so η = 1000 spreads
    * the multiplier over ~1.0–1.35× — large enough that the reweight is
    * visible at 4 dp, small enough that no domain dominates. */
  private[operators] val DoremiEtaFp = 1000L

  /** DoReMi-style domain reweighting (Xie et al. 2023): upweight the
    * domains the reference model fits WORST — excess loss per domain,
    * exponentiated into multiplicative weights over the baseline token
    * shares. The reference model here is [[LanguageModel]]'s corpus
    * bigram model (ONE definition — `mix_doremi` and `text_lm_score`
    * share the kernel by construction); a deployment substitutes its
    * proxy/reference model losses, same shape. Determinism choices:
    * excess loss is the EXACT integer gap between the corpus-wide and
    * per-domain mean fixed-point bigram probabilities (integer `div`,
    * order-free integer sums), and the exponential is LINEARIZED to its
    * first-order expansion `1 + η·excess` in 1e6 fixed point — `exp()`
    * is a transcendental with no cross-engine rounding guarantee (the
    * [[mixTemperature]] `pow` stance), while the linear form is exact
    * integer arithmetic at every step. Headroom: weight =
    * tokens·mult/1e6 stays within BIGINT up to ~6.9e12 tokens per
    * domain (≈ a 25 TB single domain); raise the fixed-point scale to
    * DECIMAL before that corpus exists.
    *
    * Scale shape: [[mixTemperature]]'s — the corpus reduces through TWO
    * map-side-combined groupBy(source) passes (token sums; bigram-model
    * scoring, whose tables are vocabulary-sized — [[LanguageModel]]'s
    * 100 TB notes); every window below runs over #sources rows of
    * metadata, never the corpus. */
  private lazy val mixDoremi = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy() // #sources rows — metadata, not corpus
      val docs = Tables.documentsSpread(s, dir)
      val toks = docs
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy("source").agg(sum("n_tokens").as("source_tokens"))
      val losses = LanguageModel.bigramProbsFx(docs, Seq("source"))
        .groupBy("source")
        .agg(sum("p_fx").as("s_fx"), count(lit(1)).as("n_big"))
      // LEFT join from toks (the complete source list): a domain whose
      // docs are all single-token has no bigrams and thus no model loss
      // — it must still appear in the mixture (excess 0 ⇒ boost ≤ 1)
      // and in the tot_tokens/tot_weight normalizations, not silently
      // vanish from the output (r17 advice).
      toks.join(losses, Seq("source"), "left")
        .withColumn("s_fx", coalesce(col("s_fx"), lit(0L)))
        .withColumn("n_big", coalesce(col("n_big"), lit(0L)))
        .withColumn("tot_fx", sum(col("s_fx")).over(w))
        .withColumn("tot_big", sum(col("n_big")).over(w))
        // CASE is lazy on both engines: the div-by-zero arm is never
        // evaluated for bigram-less domains, and n_big > 0 implies
        // tot_big > 0 on the other arm
        .withColumn("excess_fp", when(col("n_big") === 0L, lit(0L))
          .otherwise(greatest(lit(0L),
            expr("tot_fx div tot_big - s_fx div n_big"))))
        .withColumn("weight", expr(
          s"(source_tokens * (1000000L + $DoremiEtaFp * excess_fp)) div 1000000L"))
        .withColumn("tot_tokens", sum(col("source_tokens")).over(w))
        .withColumn("tot_weight", sum(col("weight")).over(w))
        .select(
          col("source"), col("source_tokens"), col("excess_fp"),
          (floor(col("source_tokens").cast("double") / col("tot_tokens") * 1e4 + 0.5) / 1e4)
            .as("actual_share"),
          (floor(col("weight").cast("double") / col("tot_weight") * 1e4 + 0.5) / 1e4)
            .as("doremi_share"),
          // boost from the EXACT intermediates, not the rounded shares
          (floor((col("weight").cast("double") / col("tot_weight")) /
            (col("source_tokens").cast("double") / col("tot_tokens")) * 1e4 + 0.5) / 1e4)
            .as("boost"))
        .orderBy("source")
    },
    Some(s"""WITH ${LanguageModel.bigramProbsSqlCtes},
      |per AS (
      |  SELECT source, CAST(SUM(p_fx) AS BIGINT) AS s_fx,
      |         CAST(COUNT(*) AS BIGINT) AS n_big
      |  FROM lmp GROUP BY source),
      |tok AS (
      |  SELECT source,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS source_tokens
      |  FROM documents GROUP BY source),
      |j AS (
      |  SELECT t.source, COALESCE(s_fx, 0) AS s_fx,
      |         COALESCE(n_big, 0) AS n_big, source_tokens,
      |         CAST(SUM(COALESCE(s_fx, 0)) OVER () AS BIGINT) AS tot_fx,
      |         CAST(SUM(COALESCE(n_big, 0)) OVER () AS BIGINT) AS tot_big
      |  FROM tok t LEFT JOIN per p USING (source)),
      |x AS (
      |  SELECT source, source_tokens,
      |         CASE WHEN n_big = 0 THEN 0
      |              ELSE GREATEST(0, tot_fx // tot_big - s_fx // n_big)
      |         END AS excess_fp
      |  FROM j),
      |wgt AS (
      |  SELECT source, source_tokens, excess_fp,
      |         (source_tokens * (1000000 + $DoremiEtaFp * excess_fp)) // 1000000 AS weight
      |  FROM x),
      |fin AS (
      |  SELECT source, source_tokens, excess_fp, weight,
      |         SUM(source_tokens) OVER () AS tot_tokens,
      |         SUM(weight) OVER () AS tot_weight
      |  FROM wgt)
      |SELECT source, CAST(source_tokens AS BIGINT) AS source_tokens,
      |  CAST(excess_fp AS BIGINT) AS excess_fp,
      |  FLOOR(CAST(source_tokens AS DOUBLE) / tot_tokens * 1e4 + 0.5) / 1e4 AS actual_share,
      |  FLOOR(CAST(weight AS DOUBLE) / tot_weight * 1e4 + 0.5) / 1e4 AS doremi_share,
      |  FLOOR((CAST(weight AS DOUBLE) / tot_weight) /
      |        (CAST(source_tokens AS DOUBLE) / tot_tokens) * 1e4 + 0.5) / 1e4 AS boost
      |FROM fin ORDER BY source""".stripMargin))

  // ---- deterministic corpus shuffle -----------------------------------

  /** Seeded global corpus permutation: every document gets a unique
    * 1-based training position `pos` in the order of a salted hash of its
    * id — the reproducible "shuffle before packing" step of a training
    * run (data order is part of the training recipe; a reshuffle is a
    * salt change, never a new code path).
    *
    * The naive form — `row_number() OVER (ORDER BY hash)` — is a GLOBAL
    * window: one task sorts and numbers the whole corpus. This is the
    * [[packSequences]] two-level decomposition applied to counting
    * instead of token sums: pos = bucket_offset(bucket) + intra-bucket
    * row_number, where bucket = first two hex digits of the hash. The
    * bucket is a PREFIX of the sort key, so (bucket, hash) order ≡ hash
    * order and the decomposition is exact — which is what the oracle's
    * one-window form checks. The intra window runs 256-way parallel; the
    * offsets are an exclusive prefix over a ≤256-row map-side-combined
    * histogram, broadcast back. On a 1000-executor cluster the bucket
    * width is a knob (4 hex digits → 65536-way) — the shape stays one
    * narrow corpus pass + metadata. */
  // ---- weighted sampling (deterministic Efraimidis-Spirakis) ----------

  private[operators] val WeightedK = 50

  /** TOKEN-WEIGHTED sampling without replacement — the A-ES reservoir
    * scheme (Efraimidis & Spirakis 2006: draw u ∈ (0,1] per item, keep
    * the top-k by u^(1/w), equivalently the SMALLEST −log(u)/w), made
    * deterministic and integer the house way: u is the 16-bit value of
    * a salted md5 nibble prefix (so the sample is reproducible — the
    * `shuffle_corpus` salt stance), and −log₂(u)/w is the exact BIGINT
    * `((16·2²⁰ − mlog2_fx(h)) · 2²⁰) div w` — Mitchell's monotone
    * fixed-point log, no ln anywhere (the [[Search]] idf precedent).
    * Weights are `n_tokens`: token-proportional document sampling, the
    * draw a mixture executes when shares are expressed in tokens.
    *
    * Shape at 100 TB: one narrow corpus pass computes the key per row
    * (hash + integer arithmetic, codegen'd), then TakeOrdered keeps k —
    * no shuffle at all; weights sum nowhere (the scheme needs no
    * normalizing pass, its defining advantage over inverse-CDF
    * sampling). */
  private val sampleWeighted = QueryDef(
    (s, dir) => {
      import graft.operators.{ImportanceSelection => IS}
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"), col("source"),
          expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"))
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat('wsample:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) + 1"))
        .withColumn("key_fx", expr(
          s"((16 * ${IS.Scale} - (${IS.mlog2Spark("h")})) * ${IS.Scale})" +
            " div greatest(n_tokens, 1L)"))
        .orderBy(col("key_fx"), col("doc_id"))
        .limit(WeightedK)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("key_fx"))
    },
    Some {
      import graft.operators.{ImportanceSelection => IS}
      s"""WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) + 1 AS h
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source, n_tokens,
        |    ((16 * ${IS.Scale} - (${IS.mlog2Duck("h")})) * ${IS.Scale})
        |      // GREATEST(n_tokens, 1) AS key_fx
        |  FROM d)
        |SELECT doc_id, source, n_tokens, CAST(key_fx AS BIGINT) AS key_fx
        |FROM k ORDER BY key_fx, doc_id LIMIT $WeightedK""".stripMargin
    })

  private val ShuffleSalt = "shuffle:"

  /** (doc_id, source, pos, total) in the seeded shuffle order — the
    * shared core of [[shuffleCorpus]] and the sharded-export family.
    * `total` rides along from the same metadata histogram (max off+cnt),
    * so consumers that need the corpus size (shard arithmetic) get it
    * without a second scan or a corpus-wide `count() OVER ()`. */
  private[operators] def shuffledPositions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("source"),
        md5(concat(lit(ShuffleSalt), col("doc_id").cast("string"))).as("skey"))
      .withColumn("bucket",
        expr("cast(conv(substring(skey, 1, 2), 16, 10) as int)"))
    val intra = Window.partitionBy("bucket").orderBy("skey", "doc_id")
    val ranked = base.withColumn("rn", row_number().over(intra).cast("long"))
    // ≤256 rows — the metadata histogram that replaces the global sort
    val hist = base.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val offs = hist
      .withColumn("total", max(col("off") + col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bucket").as("o_bucket"), col("off"), col("total"))
    ranked.join(broadcast(offs), col("bucket") === col("o_bucket"))
      .select(col("doc_id"), col("source"),
        (col("off") + col("rn")).as("pos"), col("total"))
  }

  private val shuffleCorpus = QueryDef(
    (s, dir) => shuffledPositions(s, dir)
      .select(col("doc_id"), col("source"), col("pos"))
      .orderBy("pos"),
    Some(s"""SELECT doc_id, source,
      |  row_number() OVER (ORDER BY md5('$ShuffleSalt' || CAST(doc_id AS VARCHAR)),
      |                     doc_id) AS pos
      |FROM documents ORDER BY pos""".stripMargin))

  // ---- balanced sharded export ----------------------------------------

  /** Shard layout report for the materialization step: shard =
    * ⌊(pos−1)·S / N⌋ over the shuffle positions — the balanced
    * contiguous-range assignment (every shard gets ⌈N/S⌉ or ⌊N/S⌋ docs,
    * ranges never interleave). The corpus never sees a global window:
    * positions come from [[shuffledPositions]]' decomposition, `total`
    * from its metadata histogram, the shard is per-row arithmetic, and
    * the report is ONE map-side-combined groupBy of S rows.
    * [[ShardedExport]] writes the actual files with this assignment. */
  private[operators] val NumShards = 16

  private val exportShards = QueryDef(
    (s, dir) => {
      shuffledPositions(s, dir)
        .withColumn("shard",
          expr(s"cast(((pos - 1) * $NumShards) div total as int)"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          min("pos").as("min_pos"), max("pos").as("max_pos"))
        .orderBy("shard")
    },
    Some(s"""WITH p AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY md5('$ShuffleSalt' || CAST(doc_id AS VARCHAR)),
      |                       doc_id) AS pos,
      |    COUNT(*) OVER () AS total
      |  FROM documents)
      |SELECT CAST(((pos - 1) * $NumShards) // total AS INT) AS shard,
      |       COUNT(*) AS n_docs, MIN(pos) AS min_pos, MAX(pos) AS max_pos
      |FROM p GROUP BY 1 ORDER BY shard""".stripMargin))

  /** JSON-string-or-null fragment for column `c` — the ONE escaping
    * definition both dialects inline (`duck` toggles only the dialect
    * spellings: the `'g'` flag DuckDB needs to replace ALL regex
    * matches where Spark always does). Escape order matters: strip the
    * un-escapable control characters (C0 minus \t \n \r), THEN escape
    * backslash (before any escape inserts new ones), then quote, then
    * spell \n \r \t. Every special character is written chr(…) so no
    * dialect string-literal escaping rule is in play; the control-strip
    * regex class is itself concat-built from chr() for the same reason. */
  private def jsonStrSql(c: String, duck: Boolean): String = {
    // Spark's class starts at NUL — Spark strings can hold U+0000 and an
    // unstripped one makes the line RFC-invalid; DuckDB VARCHAR cannot
    // hold NUL (chr(0) is an error there), so its class starts at 1 and
    // the strip is vacuously aligned.
    val lo = if (duck) "chr(1)" else "chr(0)"
    val cls = s"concat('[', $lo, '-', chr(8), chr(11), chr(12), " +
      "chr(14), '-', chr(31), ']')"
    val stripped =
      if (duck) s"regexp_replace($c, $cls, '', 'g')"
      else s"regexp_replace($c, $cls, '')"
    val esc = s"""replace(replace(replace(replace(replace($stripped,
      |    chr(92), chr(92) || chr(92)),
      |    chr(34), chr(92) || chr(34)),
      |    chr(10), chr(92) || 'n'),
      |    chr(13), chr(92) || 'r'),
      |    chr(9), chr(92) || 't')""".stripMargin
    s"""CASE WHEN $c IS NULL THEN 'null' ELSE concat('"', $esc, '"') END"""
  }

  private def jsonLineSql(duck: Boolean): String = {
    val str = if (duck) "VARCHAR" else "STRING"
    s"""concat('{"doc_id":',
       |  CASE WHEN doc_id IS NULL THEN 'null' ELSE CAST(doc_id AS $str) END,
       |  ',"lang":', ${jsonStrSql("lang", duck)},
       |  ',"source":', ${jsonStrSql("source", duck)},
       |  ',"text":', ${jsonStrSql("text", duck)}, '}')""".stripMargin
  }

  /** JSONL export formatting — the interchange format every LLM training
    * stack ingests: one JSON object per document, built EXPLICITLY
    * (fixed key order, full RFC 8259 string escaping — backslash,
    * quote, \n \r \t spelled, remaining C0 controls stripped — and
    * NULL fields as JSON null) rather than via an engine's to_json
    * (whose key ordering/float formatting is engine-specific — exactly
    * what an oracle-checked exporter must not depend on). One escaping
    * definition generates BOTH dialects ([[jsonStrSql]]), so Spark and
    * the twin cannot drift; NULL inputs never hit concat (Spark
    * null-propagates where DuckDB skips — both unreachable behind the
    * CASE/coalesce). Shards are doc_id-hash-keyed ([[NumShards]], same
    * count as `export_shards`).
    *
    * Shape at 100 TB: pure narrow per-row formatting (zero shuffle —
    * the presentation sort here is the oracle's determinism, not the
    * writer's; a real export hangs `.write.partitionBy("shard").text`
    * off the `line` column, the [[graft.operators.ShardedExport]]
    * layout). */
  private val exportJsonl = QueryDef(
    (s, dir) => {
      Tables.documentsSpread(s, dir)
        .withColumn("shard",
          pmod(conv(substring(md5(concat(lit("shard:"),
            coalesce(col("doc_id").cast("string"), lit("")))), 1, 4),
            16, 10).cast("int"),
            lit(NumShards)))
        .withColumn("line", expr(jsonLineSql(duck = false)))
        .select(col("doc_id"), col("shard"), col("line"))
        // explicit null placement (Spark defaults nulls FIRST, DuckDB
        // LAST) + line tie-break so several null-id rows still have a
        // deterministic total order
        .orderBy(col("doc_id").asc_nulls_first, col("line"))
    },
    Some(s"""SELECT doc_id,
      |  CAST(('0x' || substr(md5('shard:' || coalesce(CAST(doc_id AS VARCHAR), '')), 1, 4)) AS INT)
      |    % $NumShards AS shard,
      |  ${jsonLineSql(duck = true)} AS line
      |FROM documents ORDER BY doc_id ASC NULLS FIRST, line""".stripMargin))

  // ---- leakage-safe holdout split -------------------------------------

  /** Content-keyed train/valid/test split: the split is a function of the
    * document's CONTENT fingerprint, never its id or position — byte-wise
    * duplicate documents land on the same side by construction, so exact
    * dups can never leak a train doc into the eval set (the id-hash split
    * everyone writes first fails exactly this way). Near-dup leakage is
    * the composition's job: run the dedup family first (as
    * `pipeline_curate` does) and the split sees one member per cluster.
    *
    * 16-bit split hash, salted separately from every other hash in the
    * repo ("split:"), thresholds floor(0.9·2¹⁶)/floor(0.95·2¹⁶) for a
    * 90/5/5 expected split. Pure narrow, zero shuffle — at any corpus
    * size this is one pass over (doc_id, text). */
  private[operators] val SplitTrainMax = 58982 // floor(0.90 * 65536)
  private[operators] val SplitValidMax = 62259 // floor(0.95 * 65536)

  /** The split assignment from a content FINGERPRINT column — the one
    * definition `split_holdout` and the curation pipeline share. */
  private[operators] def splitColumn(fp: Column): Column = {
    val h = conv(substring(md5(concat(lit("split:"), fp)), 1, 4),
      16, 10).cast("int")
    when(h < SplitTrainMax, "train")
      .when(h < SplitValidMax, "valid")
      .otherwise("test")
  }

  /** DuckDB twin of [[splitColumn]] over a fingerprint expression. */
  private[operators] def splitSql(fp: String): String =
    s"""CASE WHEN CAST(('0x' || substr(md5('split:' || $fp), 1, 4)) AS INT) < $SplitTrainMax THEN 'train'
      |     WHEN CAST(('0x' || substr(md5('split:' || $fp), 1, 4)) AS INT) < $SplitValidMax THEN 'valid'
      |     ELSE 'test' END""".stripMargin

  private val splitHoldout = QueryDef(
    (s, dir) => {
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"), md5(col("text")).as("fingerprint"))
        .select(col("doc_id"), col("fingerprint"),
          splitColumn(col("fingerprint")).as("split"))
        .orderBy("doc_id")
    },
    Some(s"""WITH f AS (
      |  SELECT doc_id, md5(text) AS fingerprint FROM documents),
      |h AS (
      |  SELECT doc_id, fingerprint,
      |         CAST(('0x' || substr(md5('split:' || fingerprint), 1, 4)) AS INT) AS h
      |  FROM f)
      |SELECT doc_id, fingerprint,
      |       CASE WHEN h < $SplitTrainMax THEN 'train'
      |            WHEN h < $SplitValidMax THEN 'valid'
      |            ELSE 'test' END AS split
      |FROM h ORDER BY doc_id""".stripMargin))

  // ---- UniMax budget-capped mixing ------------------------------------

  /** UniMax mixture allocation (Chung et al. 2023, arXiv:2304.09151):
    * spend a total token budget across sources so that every source is
    * repeated at most [[UnimaxCap]] epochs and the remainder spreads as
    * uniformly as possible — the principled multilingual alternative to
    * temperature flattening. The published recurrence, sources ASCENDING
    * by size: fair share = remaining budget div remaining sources; a
    * source takes min(cap·tokens, fair share); what it cannot absorb
    * rolls forward to the larger sources.
    *
    * The recurrence is SEQUENTIAL over #sources rows — metadata, not
    * corpus (the driver-held-centroids stance): the corpus reduces via
    * ONE map-side-combined groupBy(source), the driver replays the
    * integer recurrence over the collected table, and the allocation
    * emits as a literal frame. All arithmetic is exact BIGINT
    * (truncating div), so the DuckDB twin — the same recurrence as a
    * linear RECURSIVE CTE — matches bit-for-bit. Budget = total div 2,
    * cap = 2 epochs (demo constants a deployment binds). */
  private lazy val mixUnimax = QueryDef(
    (s, dir) => {
      val per = Tables.documentsSpread(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy("source").agg(sum("n_tokens").as("source_tokens"))
      val rows = per.orderBy("source_tokens", "source").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      var remaining = rows.map(_._2).sum / 2
      val out = rows.zipWithIndex.map { case ((src, tok), idx) =>
        val fair = remaining / (rows.length - idx)
        val alloc = math.min(UnimaxCap * tok, fair)
        remaining -= alloc
        (src, tok, alloc, UnimaxCap * tok <= fair)
      }
      import s.implicits._
      s.createDataset(out.toIndexedSeq)
        .toDF("source", "source_tokens", "alloc_tokens", "capped")
        .withColumn("epochs_e4",
          expr("(alloc_tokens * 10000) div source_tokens"))
        .select("source", "source_tokens", "alloc_tokens", "epochs_e4", "capped")
        .orderBy("source")
    },
    Some(s"""WITH RECURSIVE per AS (
      |  SELECT source,
      |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS source_tokens
      |  FROM documents GROUP BY 1),
      |usrc AS (
      |  SELECT source, source_tokens,
      |         CAST(row_number() OVER (ORDER BY source_tokens, source) AS BIGINT)
      |           AS i,
      |         CAST(COUNT(*) OVER () AS BIGINT) AS k,
      |         CAST(SUM(source_tokens) OVER () AS BIGINT) AS total
      |  FROM per),
      |rec AS (
      |  SELECT CAST(0 AS BIGINT) AS i,
      |         (SELECT total // 2 FROM usrc LIMIT 1) AS remaining,
      |         CAST(NULL AS VARCHAR) AS source,
      |         CAST(NULL AS BIGINT) AS source_tokens,
      |         CAST(NULL AS BIGINT) AS alloc_tokens,
      |         CAST(NULL AS BOOLEAN) AS capped
      |  UNION ALL
      |  SELECT s.i,
      |         r.remaining
      |           - LEAST($UnimaxCap * s.source_tokens,
      |                   r.remaining // (s.k - s.i + 1)),
      |         s.source, s.source_tokens,
      |         LEAST($UnimaxCap * s.source_tokens,
      |               r.remaining // (s.k - s.i + 1)),
      |         $UnimaxCap * s.source_tokens <= r.remaining // (s.k - s.i + 1)
      |  FROM rec r JOIN usrc s ON s.i = r.i + 1)
      |SELECT source, source_tokens, alloc_tokens,
      |  (alloc_tokens * 10000) // source_tokens AS epochs_e4, capped
      |FROM rec WHERE i > 0 ORDER BY source""".stripMargin))

  private val UnimaxCap = 2L

  val all: Map[String, QueryDef] = Map(
    "mix_unimax" -> mixUnimax,
    "sample_stratified" -> sampleStratified,
    "mix_budget_cutoff" -> mixBudgetCutoff,
    "pack_sequences" -> packSequences,
    "mix_epochs" -> mixEpochs,
    "mix_epochs_materialize" -> mixEpochsMaterialize,
    "chunk_documents" -> chunkDocuments,
    "mix_quality_buckets" -> mixQualityBuckets,
    "mix_domain_cap" -> mixDomainCap,
    "mix_quality_by_source" -> mixQualityBySource,
    "sample_weighted" -> sampleWeighted,
    "shuffle_corpus" -> shuffleCorpus,
    "split_holdout" -> splitHoldout,
    "mix_temperature" -> mixTemperature,
    "mix_doremi" -> mixDoremi,
    "export_shards" -> exportShards,
    "export_jsonl" -> exportJsonl)
}
