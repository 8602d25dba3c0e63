package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines
 * (beyond the reference surface — SURVEY.md §7.1 item 6): token counting,
 * quality scoring, language ID, document fingerprinting.
 *
 * Design rules for 100 TB:
 *  - everything is per-row narrow computation (no shuffle at all) built
 *    from codegen'd `functions`/HOFs — no UDFs, no driver loops;
 *  - token arrays are computed once per query plan and reused;
 *  - deterministic across engines: md5-based hashing only (identical in
 *    Spark and DuckDB), explicit rounding on every double output.
 */
object TextAnalysis {

  /** Tokens of the single-space-separated `text` column. */
  def tokens(c: Column): Column = split(c, " ")

  /** Lexical diversity: distinct / total tokens. Expects `toks` and
    * `n_tokens` columns in scope — the ONE definition shared by
    * `text_quality` and the curation pipeline's gate. */
  def diversityExpr: Column =
    size(array_distinct(col("toks"))).cast("double") / col("n_tokens")

  /** Fraction of the most frequent token (per-row mode over the small
    * distinct-token set — never a corpus groupBy). Expects `toks` and
    * `n_tokens`; shared by `text_repetition` and the pipeline gate. */
  def topWordRatioExpr: Column =
    expr("array_max(transform(array_distinct(toks), d -> size(filter(toks, t -> t = d))))")
      .cast("double") / col("n_tokens")

  /** Token count + distinct-token count + char stats — the basic
    * token-accounting operator. */
  private val textTokens = QueryDef(
    // measured r21 (interleaved A/B, 2 reps): spreading wins here
    // (0.79 -> 0.72 / 0.78 -> 0.65 s — the pre-tokenizer class regexes
    // are heavy enough per row), while the same spread LOSES on
    // text_gopher_rules (0.85 -> 1.0) and text_lang_id (0.63 -> 0.78),
    // whose flag math is lighter than the exchange — those two scans
    // stay as-is (at scale they parallelize by themselves).
    (s, dir) => Tables.documentsSpread(s, dir)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        length(col("text")).as("n_chars_actual"),
        // GPT-style pre-tokenizer classes: letter runs / digit runs /
        // other-symbol runs (the BPE-ish count used for budget estimates)
        size(regexp_extract_all(col("text"),
          lit("\\p{L}+|\\d+|[^\\s\\p{L}\\d]+"), lit(0))).as("n_regex_tokens"),
        // subword estimate: BPE yields roughly ceil(len/4) units per word
        expr("aggregate(transform(toks, t -> CAST(ceil(length(t) / 4.0) AS INT)), 0, (a, x) -> a + x)")
          .as("n_subword_est"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
      |  CAST(length(text) AS INT) AS n_chars_actual,
      |  CAST(len(regexp_extract_all(text, '\p{L}+|\d+|[^\s\p{L}\d]+', 0)) AS INT) AS n_regex_tokens,
      |  CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
      |         t -> CAST(ceil(length(t) / 4.0) AS INT))), (a, x) -> a + x) AS INT) AS n_subword_est
      |FROM documents ORDER BY doc_id""".stripMargin))

  private val stopwords = Seq("the", "a", "of", "and", "to")
  private[operators] def stopList = stopwords.map(w => s"'$w'").mkString(", ")

  /** The raw quality signals (`toks`, `n_tokens`, `stop_ratio`,
    * `diversity`, `avg_token_len`) over a `documents`-shaped frame — the
    * ONE scoring chain shared by `text_quality` and
    * `mix_quality_buckets`, so the two can never disagree on what
    * quality means. */
  private[operators] def qualityRaw(docs: DataFrame): DataFrame = docs
    .withColumn("toks", tokens(col("text")))
    .withColumn("n_tokens", size(col("toks")))
    .withColumn("stop_ratio",
      expr(s"size(filter(toks, t -> t IN ($stopList)))") / col("n_tokens"))
    .withColumn("diversity", diversityExpr)
    .withColumn("avg_token_len",
      (length(col("text")) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))

  /** Composite quality score ×1e4 as an EXACT integer, in PURE INTEGER
    * arithmetic end-to-end. The score is the rational
    * `min(n,100)/100 · (n−stops)/n · distinct/n`, so with
    * `num = min(n,100)·(n−stops)·distinct·10⁴` and `den = 100·n²` the
    * half-up-rounded fixed point is `floor(num/den + 1/2)` =
    * `(2·num + den) div (2·den)`. No double exists anywhere in the
    * chain: the previous float form (`floor(double-product·1e4 + 0.5)`)
    * was a chain of double multiplies whose folding/reassociation is not
    * guaranteed stable across ENGINE BUILDS — a doc whose product sits a
    * ULP from a floor boundary can flip `score_fp` and move a quintile
    * edge (the repeated `mix_quality_buckets` driver-vs-local
    * divergence). QualityBucketsSuite pins integer ≡ old-float on the
    * fixture. As a BIGINT the score also ranks/aggregates exactly (the
    * property `mix_quality_buckets`' global ranking rides on). Expects
    * `toks` + `n_tokens` in scope ([[qualityRaw]]'s columns). */
  private[operators] def qualityScoreFp: Column = expr(
    s"""(2 * (least(CAST(n_tokens AS BIGINT), 100) *
       |      (CAST(n_tokens AS BIGINT) - size(filter(toks, t -> t IN ($stopList)))) *
       |      CAST(size(array_distinct(toks)) AS BIGINT) * 10000)
       |  + 100 * CAST(n_tokens AS BIGINT) * CAST(n_tokens AS BIGINT))
       |div (200 * CAST(n_tokens AS BIGINT) * CAST(n_tokens AS BIGINT))""".stripMargin)

  /** DuckDB twin of [[qualityScoreFp]] — the same integer arithmetic
    * (`//` floors ≡ `div` truncates on these non-negative operands).
    * Expects `toks` + `n_tokens` in scope. ONE definition inlined by
    * every oracle that scores quality (`text_quality`,
    * `mix_quality_buckets`, the curation pipeline) so the engines can
    * never disagree on what quality means. */
  private[operators] def scoreFpSql: String =
    s"""(2 * (LEAST(CAST(n_tokens AS BIGINT), 100) *
       |      (CAST(n_tokens AS BIGINT) - len(list_filter(toks, t -> t IN ($stopList)))) *
       |      CAST(len(list_distinct(toks)) AS BIGINT) * 10000)
       |  + 100 * CAST(n_tokens AS BIGINT) * CAST(n_tokens AS BIGINT))
       |// (200 * CAST(n_tokens AS BIGINT) * CAST(n_tokens AS BIGINT))""".stripMargin

  /** Quality scoring: stopword ratio, lexical diversity, mean token
    * length, composite score — the heuristics used to filter web corpora. */
  private val textQuality = QueryDef(
    (s, dir) => qualityRaw(Tables.documents(s, dir))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("diversity"), 4).as("diversity"),
        round(col("avg_token_len"), 4).as("avg_token_len"),
        // fp/1e4 is exact (fp ≤ 1e4 fits a double), ≡ the old inline form
        (qualityScoreFp.cast("double") / 1e4).as("quality_score"))
      .orderBy("doc_id"),
    Some(s"""WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS toks,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, n_tokens,
      |    len(list_filter(toks, t -> t IN ($stopList))) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |    len(list_distinct(toks)) / CAST(n_tokens AS DOUBLE) AS diversity,
      |    (length(text) - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
      |    $scoreFpSql AS score_fp
      |  FROM t)
      |SELECT doc_id, n_tokens,
      |  ROUND(stop_ratio, 4) AS stop_ratio,
      |  ROUND(diversity, 4) AS diversity,
      |  ROUND(avg_token_len, 4) AS avg_token_len,
      |  score_fp / 1e4 AS quality_score
      |FROM q ORDER BY doc_id""".stripMargin))

  /** Marker-token profiles for the n-gram-heuristic language ID. Tiny and
    * hardcoded: language ID at corpus scale is a per-row scoring pass, not
    * a model join. Ties break alphabetically (deterministic). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "la", "les"),
    "zh" -> Seq("de", "le", "shi"))

  private val textLangId = QueryDef(
    (s, dir) => {
      var df = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")))
      for ((lang, markers) <- langMarkers) {
        val list = markers.map(m => s"'$m'").mkString(", ")
        df = df.withColumn(s"score_$lang",
          expr(s"size(filter(toks, t -> t IN ($list)))") / col("n_tokens"))
      }
      val langs = langMarkers.map(_._1)
      // argmax with alphabetical tie-break: first lang whose score >= all
      val predicted = langs.foldRight(lit(langs.last)) { (lang, rest) =>
        val ge = langs.filter(_ != lang)
          .map(o => col(s"score_$lang") >= col(s"score_$o"))
          .reduce(_ && _)
        when(ge, lit(lang)).otherwise(rest)
      }
      df.select(
          col("doc_id"),
          predicted.as("predicted_lang"),
          round(greatest(langs.map(l => col(s"score_$l")): _*), 4).as("confidence"),
          col("lang").as("labeled_lang"))
        .withColumn("agrees", col("predicted_lang") === col("labeled_lang"))
        .orderBy("doc_id")
    },
    Some {
      val scoreCols = langMarkers.map { case (lang, markers) =>
        val list = markers.map(m => s"'$m'").mkString(", ")
        s"len(list_filter(toks, t -> t IN ($list))) / CAST(n_tokens AS DOUBLE) AS score_$lang"
      }.mkString(",\n    ")
      val langs = langMarkers.map(_._1)
      val caseExpr = langs.init.map { lang =>
        val ge = langs.filter(_ != lang).map(o => s"score_$lang >= score_$o").mkString(" AND ")
        s"WHEN $ge THEN '$lang'"
      }.mkString(" ")
      val greatest = s"GREATEST(${langs.map(l => s"score_$l").mkString(", ")})"
      s"""WITH t AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS toks,
         |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id, lang,
         |    $scoreCols
         |  FROM t)
         |SELECT doc_id,
         |  CASE $caseExpr ELSE '${langs.last}' END AS predicted_lang,
         |  ROUND($greatest, 4) AS confidence,
         |  lang AS labeled_lang,
         |  (CASE $caseExpr ELSE '${langs.last}' END) = lang AS agrees
         |FROM sc ORDER BY doc_id""".stripMargin
    })

  /** Document fingerprinting: full-content fingerprint over normalized
    * text plus a shorter prefix band (the cheap pre-cluster key used
    * before pairwise dedup). */
  private val docFingerprint = QueryDef(
    // spread (r20 opt): the per-character rolling-hash fold is the
    // heaviest per-row expression in the text family and ran entirely on
    // the fixture's 1-task scan (4-task query); the documents-family
    // spread applies (exchange is corpus-text-sized, tiny here; a no-op
    // at scale)
    (s, dir) => Tables.documentsSpread(s, dir)
      .withColumn("normalized",
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))
      .select(
        col("doc_id"),
        md5(col("normalized")).as("fingerprint"),
        substring(md5(col("normalized")), 1, 8).as("fingerprint_band"),
        // polynomial rolling hash over character codes, mod 1e9+7 each
        // step (no overflow, engine-identical): h = (h*31 + code) % p
        expr("""aggregate(transform(split(normalized, ''), c -> ascii(c)),
               |0L, (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin)
          .as("rolling_hash"))
      .orderBy("doc_id"),
    Some("""WITH n AS (
      |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS normalized
      |  FROM documents)
      |SELECT doc_id,
      |  md5(normalized) AS fingerprint,
      |  substr(md5(normalized), 1, 8) AS fingerprint_band,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(normalized, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (h, c) -> (h * 31 + c) % 1000000007) AS rolling_hash
      |FROM n ORDER BY doc_id""".stripMargin))

  /** Repetition scoring (the Gopher-rules repetition family): duplicate
    * word ratio, duplicate-bigram ratio, and top-word fraction, plus the
    * composite keep/drop flag a pipeline filters on. Like the rest of
    * this file it is pure per-row HOF computation — zero shuffle, the
    * mode is computed per row over the (small) distinct-token set, never
    * via a corpus-level groupBy. */
  private val textRepetition = QueryDef(
    // spread (r20 opt): same 1-task-scan relief as doc_fingerprint — the
    // per-row bigram/top-word HOFs dominate and parallelize off the
    // exchange
    (s, dir) => Tables.documentsSpread(s, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("bigrams", expr(
        """CASE WHEN size(toks) < 2 THEN array()
          |ELSE transform(sequence(0, size(toks) - 2),
          |       i -> concat(toks[i], ' ', toks[i + 1])) END""".stripMargin))
      .withColumn("dup_word_ratio",
        lit(1.0) - size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
      .withColumn("dup_bigram_ratio",
        when(size(col("bigrams")) === 0, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") / size(col("bigrams"))))
      .withColumn("top_word_ratio", topWordRatioExpr)
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("dup_word_ratio"), 4).as("dup_word_ratio"),
        round(col("dup_bigram_ratio"), 4).as("dup_bigram_ratio"),
        round(col("top_word_ratio"), 4).as("top_word_ratio"),
        (col("top_word_ratio") > 0.2 || col("dup_bigram_ratio") > 0.5).as("repetitive"))
      .orderBy("doc_id"),
    Some("""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, toks, n_tokens,
      |    CASE WHEN n_tokens < 2 THEN []
      |         ELSE list_transform(range(1, n_tokens),
      |                i -> toks[i] || ' ' || toks[i + 1]) END AS bigrams
      |  FROM t),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |    1.0 - len(list_distinct(toks)) / CAST(n_tokens AS DOUBLE) AS dup_word_ratio,
      |    CASE WHEN len(bigrams) = 0 THEN 0.0
      |         ELSE 1.0 - len(list_distinct(bigrams)) / CAST(len(bigrams) AS DOUBLE)
      |    END AS dup_bigram_ratio,
      |    list_max(list_transform(list_distinct(toks),
      |      d -> len(list_filter(toks, t -> t = d)))) / CAST(n_tokens AS DOUBLE) AS top_word_ratio
      |  FROM b)
      |SELECT doc_id, n_tokens,
      |  ROUND(dup_word_ratio, 4) AS dup_word_ratio,
      |  ROUND(dup_bigram_ratio, 4) AS dup_bigram_ratio,
      |  ROUND(top_word_ratio, 4) AS top_word_ratio,
      |  (top_word_ratio > 0.2 OR dup_bigram_ratio > 0.5) AS repetitive
      |FROM r ORDER BY doc_id""".stripMargin))

  /** The Gopher rule set (Rae et al. 2021, arXiv:2112.11446 Table A1) —
    * the PUBLISHED heuristic gate battery web corpora are filtered with,
    * as named per-rule verdicts rather than `text_quality`'s composite
    * score: word-count bounds, mean-word-length bounds, symbol-to-word
    * ratios (# and ellipsis), bullet-/ellipsis-line fractions,
    * alphabetic-word fraction, and a minimum stopword count (Gopher's
    * own 8-word list — deliberately distinct from [[stopwords]], which
    * backs the composite score).
    *
    * The two line-granular rules are computed generally but are
    * near-vacuous on this corpus (the synthetic docs are single-line);
    * on real crawl text they are the rules that fire most.
    *
    * Determinism: every ratio is ONE int/int IEEE division (comparisons
    * then agree by construction); display rounding is the floor-half-up
    * form, never engine round(). 100 TB shape: pure per-row narrow —
    * no shuffle, no join, scan-bound like the rest of the text family. */
  private val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The per-rule signal columns over any (…, text) frame — the ONE
    * definition both the `text_gopher_rules` report and the pipeline's
    * gate build on. Adds (toks, n_words, mean_word_len, hash_ratio,
    * ellip_ratio, lines, bullet_frac, ellip_line_frac, alpha_word_ratio,
    * n_stop_hits); [[gopherSignalCols]] lists them for dropping. */
  private[operators] def gopherSignals(docs: DataFrame): DataFrame = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_words", size(col("toks")))
      .withColumn("mean_word_len",
        (length(col("text")) - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("hash_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "#", ""))).cast("double")
          / col("n_words"))
      .withColumn("ellip_ratio",
        ((length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3)
          + (length(col("text")) - length(regexp_replace(col("text"), "…", "")))).cast("double")
          / col("n_words"))
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("bullet_frac",
        expr("size(filter(lines, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %'))")
          .cast("double") / size(col("lines")))
      .withColumn("ellip_line_frac",
        expr("size(filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))")
          .cast("double") / size(col("lines")))
      .withColumn("alpha_word_ratio",
        expr("size(filter(toks, t -> t RLIKE '[A-Za-z]'))").cast("double") / col("n_words"))
      .withColumn("n_stop_hits",
        expr(s"size(filter(toks, t -> t IN (${gopherStops.map(w => s"'$w'").mkString(", ")})))"))

  private[operators] val gopherSignalCols = Seq("toks", "n_words",
    "mean_word_len", "hash_ratio", "ellip_ratio", "lines", "bullet_frac",
    "ellip_line_frac", "alpha_word_ratio", "n_stop_hits")

  /** (flag name, predicate over [[gopherSignals]]' columns) per rule.
    * The predicate strings are plain comparisons — valid in BOTH SQL
    * dialects — so report flags, the gate, and the DuckDB twin all parse
    * THIS one definition; a threshold can't half-change. */
  private[operators] val gopherRuleSql: Seq[(String, String)] = Seq(
    "ok_word_count" -> "n_words BETWEEN 50 AND 100000",
    "ok_mean_word_len" -> "mean_word_len >= 3.0 AND mean_word_len <= 10.0",
    "ok_symbol_ratio" -> "hash_ratio <= 0.1 AND ellip_ratio <= 0.1",
    "ok_bullet_lines" -> "bullet_frac <= 0.9",
    "ok_ellipsis_lines" -> "ellip_line_frac <= 0.3",
    "ok_alpha_words" -> "alpha_word_ratio >= 0.8",
    "ok_stopwords" -> "n_stop_hits >= 2")

  private[operators] def gopherPassPredSql: String =
    gopherRuleSql.map { case (_, p) => s"($p)" }.mkString(" AND ")

  /** The all-rules-pass predicate over [[gopherSignals]]' columns. */
  private[operators] def gopherPassCol: Column = expr(gopherPassPredSql)

  /** The rule battery over any (doc_id, text) frame — the operator body
    * behind `text_gopher_rules`, callable on fixture frames in tests. */
  private[operators] def gopherRules(docs: DataFrame): DataFrame =
    gopherSignals(docs)
      .select(Seq(
        col("doc_id"),
        col("n_words"),
        (floor(col("mean_word_len") * 1e4 + 0.5) / 1e4).as("mean_word_len"),
        (floor(col("alpha_word_ratio") * 1e4 + 0.5) / 1e4).as("alpha_word_ratio"),
        col("n_stop_hits")) ++
        gopherRuleSql.map { case (name, p) => expr(p).as(name) } :+
        gopherPassCol.as("passes_gopher"): _*)
      .orderBy("doc_id")

  /** DuckDB twin of [[gopherSignals]]: a SELECT producing `keepCols` +
    * the signal columns over `src`. Internal names (gtoks/glines) avoid
    * colliding with pipeline CTEs that already carry toks columns. */
  private[operators] def gopherSignalsSql(src: String, keepCols: String): String =
    s"""SELECT $keepCols, n_words,
      |    (length(text) - (n_words - 1)) / CAST(n_words AS DOUBLE) AS mean_word_len,
      |    (length(text) - length(replace(text, '#', ''))) / CAST(n_words AS DOUBLE) AS hash_ratio,
      |    ((length(text) - length(replace(text, '...', ''))) // 3
      |      + (length(text) - length(replace(text, '…', '')))) / CAST(n_words AS DOUBLE) AS ellip_ratio,
      |    len(list_filter(glines, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %'))
      |      / CAST(len(glines) AS DOUBLE) AS bullet_frac,
      |    len(list_filter(glines, l -> l LIKE '%...' OR l LIKE '%…'))
      |      / CAST(len(glines) AS DOUBLE) AS ellip_line_frac,
      |    len(list_filter(gtoks, t -> regexp_matches(t, '[A-Za-z]')))
      |      / CAST(n_words AS DOUBLE) AS alpha_word_ratio,
      |    CAST(len(list_filter(gtoks, t -> t IN (${gopherStops.map(w => s"'$w'").mkString(", ")}))) AS INT) AS n_stop_hits
      |  FROM (SELECT *, string_split(text, ' ') AS gtoks,
      |          CAST(len(string_split(text, ' ')) AS INT) AS n_words,
      |          string_split(text, chr(10)) AS glines
      |        FROM $src)""".stripMargin

  private val textGopherRules = QueryDef(
    (s, dir) => gopherRules(Tables.documents(s, dir)),
    Some(s"""WITH r AS (
      |  ${gopherSignalsSql("documents", "doc_id")})
      |SELECT doc_id, n_words,
      |  FLOOR(mean_word_len * 1e4 + 0.5) / 1e4 AS mean_word_len,
      |  FLOOR(alpha_word_ratio * 1e4 + 0.5) / 1e4 AS alpha_word_ratio,
      |  n_stop_hits,
      |${gopherRuleSql.map { case (n, p) => s"  ($p) AS $n" }.mkString(",\n")},
      |  ($gopherPassPredSql) AS passes_gopher
      |FROM r ORDER BY doc_id""".stripMargin))

  /** Per-doc TOKEN-DISTRIBUTION ENTROPY — the information-theoretic
    * repetitiveness signal next to the Gopher count ratios: templated /
    * keyword-stuffed documents concentrate probability mass on few
    * tokens and score low, diverse prose scores near log2(vocab).
    * H = log2(n) − (Σ_w c_w·log2(c_w)) / n over the doc's token counts.
    *
    * Determinism (the [[ImportanceSelection]] stance verbatim): log2 is
    * MITCHELL'S binary-log in 2^20 fixed point — bin()/shift/int-div
    * only, monotone, exact at powers of two — summed as exact BIGINTs;
    * the one truncating division (sum_fx div n) truncates identically in
    * both engines (nonnegative operands), and the final /2^20 is an
    * exact binary rescale. No transcendental is ever evaluated.
    * Overflow: c·mlog2fx(c) ≤ c·63·2^20 — safe past 10^11-token docs.
    *
    * Shape at 100 TB: the LM-table reduction — ONE map-side-combined
    * groupBy(doc_id, token) reduces the corpus to per-doc vocabularies,
    * ONE map-side-combined rollup to docs. No joins, no windows, no
    * driver state. */
  private val textEntropy = QueryDef(
    (s, dir) => {
      import ImportanceSelection.{mlog2Spark, Scale}
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("vocab_size"),
          sum(expr(s"c * (${mlog2Spark("c")})")).as("sfx"))
        .select(col("doc_id"), col("n_tokens"), col("vocab_size"),
          ((expr(mlog2Spark("n_tokens")) - expr("sfx div n_tokens"))
            .cast("double") / Scale.toDouble).as("entropy"))
        .orderBy("doc_id")
    },
    Some {
      import ImportanceSelection.{mlog2Duck, Scale}
      s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |cnt AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY doc_id, w),
      |agg AS (
      |  SELECT doc_id,
      |         CAST(SUM(c) AS BIGINT) AS n_tokens,
      |         COUNT(*) AS vocab_size,
      |         CAST(SUM(c * (${mlog2Duck("c")})) AS BIGINT) AS sfx
      |  FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n_tokens, vocab_size,
      |  CAST((${mlog2Duck("n_tokens")}) - (sfx // n_tokens) AS DOUBLE) / $Scale
      |    AS entropy
      |FROM agg ORDER BY doc_id""".stripMargin
    })

  /** READABILITY scoring — the Flesch-Kincaid grade level, the classic
    * length-complexity signal next to [[textQuality]]'s ratios (corpus
    * curation uses it to bucket corpora by audience level and to cut
    * degenerate keyword-stuffing pages that score off-scale).
    *
    * Determinism: the whole grade is ONE integer division of exact
    * BIGINTs. FK·100 = 39·w/s + 1180·syl/w − 1559 over the common
    * denominator s·w gives `(39·w² + 1180·syl·s) div (s·w) − 1559` —
    * numerator and denominator are positive, so Spark's
    * truncate-toward-zero `div` ≡ DuckDB's floor `//`. Syllables are
    * the vowel-GROUP count (runs of [aeiouy] in the lowercased text,
    * the standard heuristic) floored at one per word; words/sentences
    * floor at 1 so empty or unpunctuated docs stay defined.
    *
    * Shape at 100 TB: pure narrow per-row work — three regex passes and
    * integer arithmetic inside one WholeStageCodegen span, no shuffle
    * until the presentation sort. */
  private val textReadability = QueryDef(
    (s, dir) => Tables.documents(s, dir)
      .withColumn("n_words", greatest(lit(1L),
        expr("size(filter(split(text, ' '), t -> length(t) > 0))").cast("long")))
      .withColumn("n_sentences", greatest(lit(1L),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.!?]", ""))).cast("long")))
      .withColumn("n_syllables", greatest(col("n_words"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("long")))
      .withColumn("fk_grade_c", expr(
        "(39 * n_words * n_words + 1180 * n_syllables * n_sentences)" +
          " div (n_sentences * n_words) - 1559"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"), col("fk_grade_c"),
        (col("fk_grade_c").cast("double") / 100.0).as("fk_grade"))
      .orderBy("doc_id"),
    Some("""WITH m AS (
      |  SELECT doc_id,
      |    GREATEST(1, CAST(len(list_filter(string_split(text, ' '),
      |      t -> len(t) > 0)) AS BIGINT)) AS n_words,
      |    GREATEST(1, CAST(length(text) -
      |      length(regexp_replace(text, '[.!?]', '', 'g')) AS BIGINT)) AS n_sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS vg
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, n_words, n_sentences,
      |    GREATEST(n_words, vg) AS n_syllables,
      |    CAST((39 * n_words * n_words + 1180 * GREATEST(n_words, vg) * n_sentences)
      |      // (n_sentences * n_words) - 1559 AS BIGINT) AS fk_grade_c
      |  FROM m)
      |SELECT doc_id, n_words, n_sentences, n_syllables, fk_grade_c,
      |  CAST(fk_grade_c AS DOUBLE) / 100.0 AS fk_grade
      |FROM g ORDER BY doc_id""".stripMargin))

  /** Demo blocklist — a deployment loads the real list (hundreds of
    * terms) from config; the mechanics are term-count-independent. The
    * fixture terms are chosen to actually HIT the synthetic corpus. */
  private[operators] val Blocklist = Seq("slow", "leak", "crash")
  private def blockSql = Blocklist.map(t => s"'$t'").mkString(", ")

  /** BLOCKLIST filtering — the C4 "bad words" gate: token-aligned,
    * case-insensitive membership against a term list (token-aligned on
    * purpose: a substring match bans "class" for containing "ass" — the
    * classic over-blocking failure). Reports per-doc hit count,
    * distinct matched terms (sorted, joined — the audit trail a
    * removal decision needs), and the keep verdict (zero hits).
    *
    * Shape at 100 TB: the list is a LITERAL in a codegen'd higher-order
    * filter (hundreds of terms — expression-sized, the FilterSpec
    * stance); pure narrow per-row work, no shuffle before the
    * presentation sort. A list too large to inline flips to the
    * [[graft.ops.SkipList]] broadcast anti-join shape. */
  private val textBlocklist = QueryDef(
    (s, dir) => Tables.documents(s, dir)
      .withColumn("toks", tokens(lower(col("text"))))
      .withColumn("hits", expr(s"filter(toks, t -> t IN ($blockSql))"))
      .select(col("doc_id"),
        size(col("hits")).as("n_hits"),
        array_join(sort_array(array_distinct(col("hits"))), " ")
          .as("matched_terms"),
        (size(col("hits")) === 0).as("keep"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
      |  CAST(len(list_filter(string_split(lower(text), ' '),
      |    t -> t IN ($blockSql))) AS INT) AS n_hits,
      |  COALESCE(array_to_string(list_sort(list_distinct(
      |    list_filter(string_split(lower(text), ' '),
      |      t -> t IN ($blockSql)))), ' '), '') AS matched_terms,
      |  len(list_filter(string_split(lower(text), ' '),
      |    t -> t IN ($blockSql))) = 0 AS keep
      |FROM documents ORDER BY doc_id""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "text_blocklist" -> textBlocklist,
    "text_readability" -> textReadability,
    "text_entropy" -> textEntropy,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_lang_id" -> textLangId,
    "text_repetition" -> textRepetition,
    "text_gopher_rules" -> textGopherRules,
    "doc_fingerprint" -> docFingerprint)
}
