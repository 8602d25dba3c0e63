package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.functions._

/**
 * N-gram language-model quality scoring — the statistical counterpart
 * to the heuristic `text_quality` gates: score each document by how
 * well a bigram model predicts it (the CCNet/KenLM-style filter that
 * separates fluent text from keyboard-mash and boilerplate).
 *
 * The model here is trained ON THE CORPUS ITSELF (deterministic,
 * self-contained for the oracle); a deployment would train the count
 * tables on a trusted reference corpus and score a crawl against them —
 * the plan shape is identical.
 *
 * Score = mean over a doc's bigrams of the add-one-smoothed conditional
 * probability P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). Two deliberate
 * determinism choices: (a) NOT log-perplexity — ln() is a transcendental
 * whose last-ulp rounding can differ between the JVM and DuckDB's libm;
 * (b) each probability is FIXED-POINT (integer-scaled by 1e6 via
 * integral division) so the per-doc mean is an EXACT long sum — a
 * floating-point sum's result depends on partition/merge order, which
 * varies run to run, let alone engine to engine. One final double
 * division (deterministic IEEE) produces the score. Long headroom:
 * (c2+1)·1e6 overflows past c2 ≈ 9.2e12 occurrences of one bigram —
 * raise the scale to DECIMAL before that corpus exists.
 *
 * 100 TB shape:
 *  - count tables: positional bigram explode ([[Dedup.explodeShingles]]
 *    pattern — no per-doc arrays) + map-side-combined groupBy; the
 *    tables are VOCABULARY-sized, not corpus-sized;
 *  - V (distinct unigrams) is a one-row aggregate, broadcast;
 *  - scoring joins key the exploded corpus against the vocab-sized
 *    tables (AQE picks broadcast when the vocab fits, shuffle-hash
 *    otherwise — never forced);
 *  - final per-doc mean is one map-side-combined groupBy(doc_id).
 */
object LanguageModel {

  // positional bigram explode: (keep..., w1, bigram) — one scalar concat
  // per position, no per-doc array (the inferred-filter trap
  // explodeShingles documents applies to any generator over a built
  // array, bigrams included)
  private def explodeBigrams(
      docs: org.apache.spark.sql.DataFrame,
      keep: Seq[String]): org.apache.spark.sql.DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(keep.map(col) :+ col("toks") :+
        explode(sequence(lit(0), size(col("toks")) - 2)).as("i"): _*)
      .select(keep.map(col) :+ expr("toks[i]").as("w1") :+
        expr("concat(toks[i], ' ', toks[i + 1])").as("bigram"): _*)

  /** One row per corpus bigram with its add-one-smoothed FIXED-POINT
    * probability — (keep..., p_fx) — the scoring kernel of
    * [[textLmScore]], exposed so `mix_doremi`'s per-domain losses
    * ([[Sampling]]) share the model by construction (one definition,
    * never a fork). */
  private[operators] def bigramProbsFx(
      docs: org.apache.spark.sql.DataFrame,
      keep: Seq[String]): org.apache.spark.sql.DataFrame = {
    // Measured r21: lazy-checkpointing docBigrams and deriving `bi`
    // from it (one explode pass instead of two) reads marginally
    // better locally (text_lm_score/mix_doremi: −1 stage, sw −17-19%,
    // 4.25→3.43 MB) but stores the full positional bigram stream
    // (~2-3x corpus bytes) on executor storage to save ONE narrow
    // explode — the store-vs-recompute calculus the r20 adjudication
    // already resolved to recompute at 100 TB. Rejected; walls were
    // host-noise-dominated either way (the same A/B protocol produced
    // a phantom 30% "win" on dsir_weights, whose plan this kernel
    // never touches — deterministic columns identical).
    val docBigrams = explodeBigrams(docs, keep)
    // model tables (vocabulary-sized)
    val uni = docs.withColumn("toks", split(col("text"), " "))
      .select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = explodeBigrams(docs, Seq.empty)
      .groupBy("bigram").agg(count(lit(1)).as("c2"))
    val vocab = uni.agg(count(lit(1)).as("v")) // one row
    docBigrams
      .join(bi, Seq("bigram"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("p_fx", expr(
        "((coalesce(c2, 0L) + 1L) * 1000000L) div (coalesce(c1, 0L) + v)"))
      .select(keep.map(col) :+ col("p_fx"): _*)
  }

  /** CTEs ending in `lmp(doc_id, source, p_fx)` — the DuckDB twin of
    * [[bigramProbsFx]] over `documents` (both keeps carried; consumers
    * project). Prefix `lm` keeps the chain composable. */
  private[operators] val bigramProbsSqlCtes: String =
    """lmt AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      |lmdb AS (
      |  SELECT doc_id, source, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bigram
      |  FROM lmt, unnest(range(1, len(toks))) AS u(i)
      |  WHERE len(toks) >= 2),
      |lmuc AS (SELECT w1, COUNT(*) AS c1
      |         FROM (SELECT unnest(toks) AS w1 FROM lmt) GROUP BY w1),
      |lmbc AS (SELECT bigram, COUNT(*) AS c2 FROM lmdb GROUP BY bigram),
      |lmv AS (SELECT COUNT(*) AS v FROM lmuc),
      |lmp AS (
      |  SELECT d.doc_id, d.source,
      |         ((COALESCE(bc.c2, 0) + 1) * 1000000) // (COALESCE(uc.c1, 0) + v.v) AS p_fx
      |  FROM lmdb d
      |  LEFT JOIN lmbc bc USING (bigram)
      |  LEFT JOIN lmuc uc USING (w1)
      |  CROSS JOIN lmv v)""".stripMargin

  private val textLmScore = QueryDef(
    (s, dir) => {
      val docs = Tables.documentsSpread(s, dir)
      bigramProbsFx(docs, Seq("doc_id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("p_fx")).as("sum_fx"))
        .select(col("doc_id"), col("n_bigrams"),
          // exact long sum → ONE deterministic double division chain;
          // floor half-up at 1e8 (probs are ~1/vocab; 4dp would flatten)
          (floor(col("sum_fx").cast("double") / col("n_bigrams") / 1e6 * 1e8 + 0.5) / 1e8)
            .as("lm_score"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $bigramProbsSqlCtes
      |SELECT doc_id, n_bigrams,
      |  FLOOR(CAST(sum_fx AS DOUBLE) / n_bigrams / 1e6 * 1e8 + 0.5) / 1e8 AS lm_score
      |FROM (
      |  SELECT doc_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(p_fx) AS BIGINT) AS sum_fx
      |  FROM lmp
      |  GROUP BY doc_id)
      |ORDER BY doc_id""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "text_lm_score" -> textLmScore)
}
