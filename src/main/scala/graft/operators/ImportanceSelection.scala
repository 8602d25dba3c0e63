package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Importance-resampling data selection (DSIR, arXiv:2302.03169): score
 * every raw document by how much more likely its hashed-unigram profile
 * is under a TARGET domain's token distribution than under the raw
 * corpus's own — the published, classifier-free way to pick
 * "looks like the high-quality domain" training data at crawl scale.
 * The heuristic gates (`text_quality`, Gopher rules) judge documents in
 * isolation; this ranks them against a reference distribution.
 *
 * Method (faithful to the paper's estimator, §3.2):
 *  - features are HASHED token buckets: bucket = first 3 md5 hex digits
 *    of the token, mod [[Buckets]] — the same md5-parity trick the span
 *    family uses, identical bytes in both engines;
 *  - per-bucket add-one-smoothed probabilities under target and raw;
 *  - doc weight = Σ_tokens log p_target(bucket) − log p_raw(bucket),
 *    i.e. the log importance ratio of the doc's unigram evidence.
 *
 * Determinism (the `text_lm_score` stance, applied to logs): a true
 * ln() is a transcendental whose last-ulp rounding the JVM and DuckDB's
 * libm need not agree on, so no engine ever evaluates one. The log here
 * is MITCHELL'S binary-log approximation (Mitchell 1962, "Computer
 * Multiplication and Division Using Binary Logarithms"):
 *   mlog2(n) = L + (n − 2^L) / 2^L,  L = ⌊log2 n⌋ = len(bin(n)) − 1
 * — exact at powers of two, piecewise-linear between (max error 0.086
 * bits), MONOTONIC, and integer-exact in fixed point at scale 2^20:
 * both engines compute it from bin()/length/shift/integer-division
 * alone. Per-doc weights are exact BIGINT sums of per-bucket fixed
 * ratios; the one double at the end divides by 2^20 — a binary scaling
 * that IEEE represents exactly — so parity is definitional.
 *
 * Overflow: (n − 2^L)·2^20 < n·2^20 — safe to n ≈ 2^43 tokens per
 * bucket; with 2^10 buckets that is ~10^16 tokens, past any corpus.
 *
 * 100 TB shape:
 *  - the bucket tables are [[Buckets]]-row aggregates (map-side
 *    combined, one corpus pass) — metadata-sized, broadcast back;
 *  - scoring is a narrow per-token explode + broadcast join + one
 *    map-side-combined groupBy(doc_id): ONE corpus-wide shuffle total,
 *    carrying (doc_id, partial sums);
 *  - nothing corpus-sized reaches the driver; the target set rides the
 *    same scan via a predicate column (a deployment would aggregate the
 *    target table separately — same plan shape, smaller left input).
 */
object ImportanceSelection {

  private[operators] val Buckets = 1024
  private[operators] val Scale = 1048576L // 2^20 fixed-point fraction bits

  /** The "high-quality target domain" of the demo fixture: three of the
    * twenty synthetic sources. A deployment points this predicate (or a
    * separate table) at wiki/books/reference text. */
  private[operators] val TargetSources = Seq("src0", "src1", "src2")

  private[operators] def targetSourceCol: Column =
    col("source").isin(TargetSources: _*)

  /** mlog2 fixed-point SQL over a NONNEGATIVE bigint expression `x`
    * (callers pass count+1 so the argument is ≥ 1), Spark dialect. */
  private[operators] def mlog2Spark(x: String): String = {
    val l = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    val p = s"shiftleft(CAST(1 AS BIGINT), $l)"
    s"($l * $Scale + ((CAST($x AS BIGINT) - $p) * $Scale) div $p)"
  }

  /** Same arithmetic, DuckDB dialect (`//` truncates toward zero like
    * Spark's `div`; operands here are nonnegative so both floor). */
  private[operators] def mlog2Duck(x: String): String = {
    val l = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    val p = s"(CAST(1 AS BIGINT) << $l)"
    s"($l * $Scale + ((CAST($x AS BIGINT) - $p) * $Scale) // $p)"
  }

  /** Hash bucket of an md5 hex string column — first 3 nibbles, mod
    * [[Buckets]]. Valid Spark AND DuckDB SQL (instr/substring/md5 agree
    * across engines — the anchor-predicate precedent). */
  private def bucketSql(hexCol: String): String = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substring($hexCol, $i, 1)) - 1)"
    s"((${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)}) % $Buckets)"
  }

  /** Per-doc DSIR importance weights over any (doc_id, text) frame.
    * `isTarget` marks the target-domain rows the bucket tables contrast
    * against; `scoreTargets = false` (the paper's estimator, the
    * standalone query) scores raw rows only, `true` (the pipeline's
    * annotation use) scores every row against the same tables.
    * Output: (doc_id, n_tokens, weight) — weight in Mitchell bits;
    * higher = more target-like. */
  private[operators] def dsirWeights(docs: DataFrame, isTarget: Column,
      scoreTargets: Boolean = false): DataFrame = {
    val tok = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(split(col("text"), " ")).as("w"))
      .withColumn("b", expr(bucketSql("md5(w)")))
    // bucket tables: Buckets rows, one corpus pass, map-side combined
    val cnt = tok.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    // per-bucket fixed-point log ratio of smoothed numerators
    val lr = cnt.select(col("b"),
      expr(s"${mlog2Spark("ct + 1")} - ${mlog2Spark("cr + 1")}").as("lr_fx"))
    // the smoothing denominators fold into ONE per-token constant:
    // log p_t − log p_r = log(ct+1) − log(cr+1) + log(Tr+B) − log(Tt+B)
    val cfx = cnt.agg(sum("ct").as("tt"), sum("cr").as("tr"))
      .select(expr(s"${mlog2Spark(s"tr + $Buckets")} - ${mlog2Spark(s"tt + $Buckets")}")
        .as("c_fx"))
    (if (scoreTargets) tok else tok.filter(!col("is_t")))
      .join(broadcast(lr), "b")
      .crossJoin(broadcast(cfx))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lr_fx") + col("c_fx")).as("w_fx"))
      // exact: w_fx is an integer sum, /2^20 is binary rescaling
      .select(col("doc_id"), col("n_tokens"),
        (col("w_fx").cast("double") / Scale.toDouble).as("weight"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[dsirWeights]]: CTE chain ending in
    * `dsirw(doc_id, n_tokens, weight)` over `src` (needs doc_id, source,
    * text). Names are d-prefixed so the chain composes into the curation
    * pipeline's oracle without collisions. */
  private[operators] def dsirSqlCtes(src: String, scoreTargets: Boolean): String = {
    val targets = TargetSources.map(t => s"'$t'").mkString(", ")
    val where = if (scoreTargets) "" else "\n  WHERE NOT is_t"
    s"""dtok AS (
      |  SELECT doc_id, source IN ($targets) AS is_t,
      |         ${bucketSql("md5(w)")} AS b
      |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      |        FROM $src)),
      |dcnt AS (
      |  SELECT b,
      |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |    CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
      |  FROM dtok GROUP BY b),
      |dlr AS (
      |  SELECT b, ${mlog2Duck("ct + 1")} - ${mlog2Duck("cr + 1")} AS lr_fx
      |  FROM dcnt),
      |dc AS (
      |  SELECT ${mlog2Duck(s"tr + $Buckets")} - ${mlog2Duck(s"tt + $Buckets")} AS c_fx
      |  FROM (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
      |               CAST(SUM(cr) AS BIGINT) AS tr FROM dcnt)),
      |dsirw AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    CAST(SUM(lr_fx + c_fx) AS DOUBLE) / $Scale AS weight
      |  FROM dtok JOIN dlr USING (b) CROSS JOIN dc$where
      |  GROUP BY doc_id)""".stripMargin
  }

  private val dsirWeightsQuery = QueryDef(
    (s, dir) => dsirWeights(
      Tables.documentsSpread(s, dir), targetSourceCol),
    Some(s"""WITH ${dsirSqlCtes("documents", scoreTargets = false)}
      |SELECT doc_id, n_tokens, weight FROM dsirw ORDER BY doc_id""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "dsir_weights" -> dsirWeightsQuery)
}
