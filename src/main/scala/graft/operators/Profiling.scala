package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus profiling — the per-source statistics report a pipeline runs
 * before and after every curation change: doc counts, token-length
 * spread (min/avg/max and exact p50/p90), language breadth.
 *
 * The percentile shape is the deliberate part. Spark's exact
 * `percentile` buffers every value of a group in memory (O(group) per
 * aggregation state — a per-source OOM at corpus scale), and
 * `approx_percentile` is not oracle-exact. Token counts live in a small
 * discrete domain, so the exact type-1 (inverse-CDF) quantile comes
 * from a HISTOGRAM instead: one map-side-combined groupBy(source,
 * n_tokens) — at most |domain| rows per source, metadata-sized — a
 * cumulative window over that histogram, and "smallest value whose
 * cumulative count reaches ceil(p·n)". Identical arithmetic runs in the
 * DuckDB twin, so parity is definitional rather than hoping two
 * engines' percentile interpolations agree bit-for-bit.
 */
object Profiling {

  private val P1 = 0.5
  private val P2 = 0.9

  private val profileDocuments = QueryDef(
    (s, dir) => {
      val base = Tables.documentsSpread(s, dir)
        .select(col("source"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
      val totals = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"),
        // floor-based half-up rounding: engine-identical on .5
        // boundaries where round()/ROUND diverge (TextAnalysis pattern)
        (floor(avg("n_tokens") * 1e4 + 0.5) / 1e4).as("avg_tokens"))
      val hist = base.groupBy("source", "n_tokens")
        .agg(count(lit(1)).as("cnt"))
      val cum = hist.withColumn("cum",
        sum(col("cnt")).over(
          Window.partitionBy("source").orderBy("n_tokens")))
        .join(broadcast(totals.select(col("source"), col("n_docs"))), "source")
      def quantile(p: Double, as: String) =
        cum.filter(col("cum") >= ceil(lit(p) * col("n_docs")))
          .groupBy("source").agg(min("n_tokens").as(as))
      totals
        .join(quantile(P1, "p50_tokens"), "source")
        .join(quantile(P2, "p90_tokens"), "source")
        .orderBy("source")
    },
    Some(s"""WITH base AS (
      |  SELECT source, lang,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |totals AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |         COUNT(DISTINCT lang) AS n_langs,
      |         MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
      |         FLOOR(AVG(n_tokens) * 1e4 + 0.5) / 1e4 AS avg_tokens
      |  FROM base GROUP BY source),
      |hist AS (
      |  SELECT source, n_tokens, COUNT(*) AS cnt FROM base GROUP BY 1, 2),
      |cum AS (
      |  SELECT h.source, h.n_tokens,
      |         SUM(h.cnt) OVER (PARTITION BY h.source ORDER BY h.n_tokens) AS cum,
      |         t.n_docs
      |  FROM hist h JOIN totals t USING (source)),
      |q1 AS (SELECT source, MIN(n_tokens) AS p50_tokens FROM cum
      |       WHERE cum >= CEIL($P1 * n_docs) GROUP BY source),
      |q2 AS (SELECT source, MIN(n_tokens) AS p90_tokens FROM cum
      |       WHERE cum >= CEIL($P2 * n_docs) GROUP BY source)
      |SELECT t.source, t.n_docs, t.n_langs, t.min_tokens, t.max_tokens,
      |       t.avg_tokens, q1.p50_tokens, q2.p90_tokens
      |FROM totals t JOIN q1 USING (source) JOIN q2 USING (source)
      |ORDER BY source""".stripMargin))

  /** Cross-source span-overlap matrix: for every source pair, how many
    * DISTINCT anchored 16-token fingerprints they share — the
    * provenance-level contamination/boilerplate report (which feeds
    * lean-out decisions: two sources sharing heavy span mass are
    * mirrors, scrapes of each other, or common boilerplate).
    *
    * Shape at 100 TB: anchored windows (≈1/8 of token positions,
    * [[Dedup.anchoredWindows]]) reduce to DISTINCT (source,
    * fingerprint) with a map-side-combined aggregate; the self-join
    * runs on that deduplicated relation — hash-partitioned by
    * fingerprint ONCE, both sides reading the same exchange — and the
    * output is source-pair-sized (metadata). Nothing corpus-sized
    * crosses the cluster twice. */
  private val profileSpanOverlap = QueryDef(
    (s, dir) => {
      val f = Dedup.anchoredWindows(
          Tables.documents(s, dir), Seq("source"))
        .select("source", "fingerprint").distinct()
        .repartition(col("fingerprint"))
      val a = f.select(col("source").as("source_a"), col("fingerprint"))
      val b = f.select(col("source").as("source_b"), col("fingerprint"))
      a.join(b, "fingerprint")
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("shared_spans"))
        .orderBy("source_a", "source_b")
    },
    Some(s"""WITH ${Dedup.anchoredWindowsSql("source")},
      |ds AS (SELECT DISTINCT source, fingerprint FROM f)
      |SELECT a.source AS source_a, b.source AS source_b,
      |       COUNT(*) AS shared_spans
      |FROM ds a JOIN ds b
      |  ON a.fingerprint = b.fingerprint AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin))

  /** Per-source vocabulary profile — the corpus-QA numbers a curation
    * change is judged against (a dedup or gate pass that collapses
    * vocabulary breadth or hapax mass shows up here first): total token
    * occurrences, distinct vocabulary size, hapax (frequency-1) count
    * and ratio, and the occurrence mass concentrated in the 100 most
    * frequent tokens (Zipf head — tie-broken count DESC, token ASC so
    * both engines pick the same head).
    *
    * 100 TB shape: ONE map-side-combined groupBy(source, token) reduces
    * the corpus to its VOCABULARY (sub-linear in corpus size, the same
    * reduction the LM-scoring tables ride); every aggregate and the
    * top-100 window then run over that counts relation, never the
    * corpus. The per-source window is vocabulary-partitioned — large at
    * web scale but Zipf-bounded, and a bounded top-k aggregation is the
    * drop-in if a vocabulary ever outgrows a partition. Ratios are ONE
    * division, display is floor-half-up. */
  private val profileVocab = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documentsSpread(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      val headMass = counts
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(col("cnt").desc, col("w"))))
        .filter(col("rn") <= 100)
        .groupBy("source").agg(sum("cnt").as("head_cnt"))
      counts.groupBy("source").agg(
          sum("cnt").as("n_tokens"),
          count(lit(1)).as("vocab_size"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax_count"))
        .join(headMass, "source")
        .select(col("source"), col("n_tokens"), col("vocab_size"),
          col("hapax_count"),
          (floor(col("hapax_count").cast("double") / col("vocab_size") * 1e4 + 0.5) / 1e4)
            .as("hapax_ratio"),
          (floor(col("head_cnt").cast("double") / col("n_tokens") * 1e4 + 0.5) / 1e4)
            .as("top100_mass"))
        .orderBy("source")
    },
    Some("""WITH counts AS (
      |  SELECT source, w, COUNT(*) AS cnt
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  GROUP BY source, w),
      |head AS (
      |  SELECT source, SUM(cnt) AS head_cnt FROM (
      |    SELECT source, cnt,
      |           row_number() OVER (PARTITION BY source
      |                              ORDER BY cnt DESC, w) AS rn
      |    FROM counts)
      |  WHERE rn <= 100 GROUP BY source),
      |agg AS (
      |  SELECT source,
      |         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |         COUNT(*) AS vocab_size,
      |         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count
      |  FROM counts GROUP BY source)
      |SELECT a.source, n_tokens, vocab_size, hapax_count,
      |  FLOOR(CAST(hapax_count AS DOUBLE) / vocab_size * 1e4 + 0.5) / 1e4 AS hapax_ratio,
      |  FLOOR(CAST(head_cnt AS DOUBLE) / n_tokens * 1e4 + 0.5) / 1e4 AS top100_mass
      |FROM agg a JOIN head USING (source)
      |ORDER BY source""".stripMargin))

  private val NgramTopK = 10

  /** Top-[[NgramTopK]] BIGRAMS per source — the boilerplate detector a
    * curation run reads next to `profile_vocab`'s unigram stats: a
    * scrape's repeated header/footer/nav phrases surface as bigrams with
    * counts far above the Zipf curve, which single tokens dilute.
    *
    * Shape at 100 TB: positional bigram explode (the [[Dedup]]
    * explode-shingles stance — never a per-doc array that an inferred
    * filter would inline into the scan), then ONE map-side-combined
    * groupBy(source, bigram) reduces the corpus to its bigram VOCABULARY;
    * the ranking window partitions by source over that vocabulary-sized
    * relation, never the corpus. Deterministic tie-break (cnt DESC,
    * bigram ASC) in both engines. */
  private val profileNgramTopk = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.documentsSpread(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("source"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 2)).as("i"))
        .select(col("source"),
          concat(expr("toks[i]"), lit(" "), expr("toks[i + 1]")).as("bigram"))
        .groupBy("source", "bigram").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("source").orderBy(col("cnt").desc, col("bigram"))))
        .filter(col("rank") <= NgramTopK)
        .select("source", "rank", "bigram", "cnt")
        .orderBy("source", "rank")
    },
    Some(s"""WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
      |b AS (
      |  SELECT source,
      |         unnest(list_transform(range(1, len(toks)),
      |           i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      |  FROM t WHERE len(toks) >= 2),
      |counts AS (
      |  SELECT source, bigram, COUNT(*) AS cnt FROM b GROUP BY source, bigram)
      |SELECT source, CAST(rn AS INT) AS rank, bigram, cnt FROM (
      |  SELECT source, bigram, cnt,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY cnt DESC, bigram) AS rn
      |  FROM counts)
      |WHERE rn <= $NgramTopK ORDER BY source, rank""".stripMargin))

  /** Per-document DUPLICATION RATIO — the fraction of a doc's anchored
    * [[Dedup.anchoredWindows]] span fingerprints that also occur in ≥2
    * distinct documents: the span-granular novelty signal (the
    * "characters in duplicated n-grams" RefinedWeb/MassiveText measure)
    * that document-level fingerprints and within-doc repetition scores
    * both miss — a unique doc stuffed with cross-corpus boilerplate
    * scores high here and nowhere else. Docs shorter than the span
    * window have no anchors and are absent (same in both engines).
    *
    * Shape at 100 TB: [[Dedup.duplicatedSpans]]' single
    * fingerprint-partitioned exchange, read by the duplicate aggregate
    * AND the annotate join (ReusedExchange); the per-doc rollup is ONE
    * map-side-combined groupBy carrying (doc_id, two longs). Ratio via
    * the repo's floor-half-up fixed rounding. */
  private val profileDocDuplication = QueryDef(
    (s, dir) => {
      val w = Dedup.anchoredWindows(Tables.documents(s, dir), Seq("doc_id"))
        .repartition(col("fingerprint"))
      val dup = w.groupBy("fingerprint")
        .agg(countDistinct("doc_id").as("n_docs"))
        .filter(col("n_docs") >= 2)
        .select(col("fingerprint"), lit(1).as("is_dup"))
      w.join(dup, Seq("fingerprint"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_anchors"),
          sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_dup_anchors"))
        .select(col("doc_id"), col("n_anchors"), col("n_dup_anchors"),
          (floor(col("n_dup_anchors").cast("double") / col("n_anchors") * 1e4 + 0.5) / 1e4)
            .as("dup_ratio"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${Dedup.anchoredWindowsSql("doc_id")},
      |dup AS (
      |  SELECT fingerprint FROM f GROUP BY 1
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |ann AS (
      |  SELECT f.doc_id,
      |         CASE WHEN d.fingerprint IS NOT NULL THEN 1 ELSE 0 END AS is_dup
      |  FROM f LEFT JOIN dup d USING (fingerprint))
      |SELECT doc_id, COUNT(*) AS n_anchors,
      |  CAST(SUM(is_dup) AS BIGINT) AS n_dup_anchors,
      |  FLOOR(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4 AS dup_ratio
      |FROM ann GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Generic PER-COLUMN schema profile — the data-quality report a
    * pipeline runs on every new extract before trusting it (null mass,
    * cardinality, bounds drift): one row per column of `orders` with
    * null count, exact distinct count, and stringified min/max. Six
    * column aggregates compute in ONE pass each (map-side combined);
    * exact distincts are per-column expand-reduce — at 100 TB swap in
    * the HLL sketch face (`agg_hll_union`) column by column where exact
    * cardinality isn't worth its shuffle. */
  /** Columns whose min/max must render through an EXPLICIT fixed-decimal
    * format: a default string cast of a double goes scientific in Spark
    * above ~1e7 (`1.2E7`) where DuckDB's VARCHAR cast stays plain — a
    * latent parity break the fixture never triggers. `%.2f` renders the
    * same bytes in both engines (the fixture's 2-decimal money values
    * are never exact binary .xx5 midpoints, so the engines' tie-rounding
    * modes can't disagree). */
  private val doubleProfileCols = Set("o_totalprice")

  private lazy val profileSchema = QueryDef(
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      def render(c: Column, name: String): Column =
        if (doubleProfileCols(name)) format_string("%.2f", c)
        else c.cast("string")
      cols.map { c =>
        o.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          render(min(col(c)), c).as("min_val"),
          render(max(col(c)), c).as("max_val"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_val"), col("max_val"))
      }.reduce(_ union _).orderBy("column_name")
    },
    Some {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      def render(inner: String, name: String): String =
        if (doubleProfileCols(name)) s"printf('%.2f', $inner)"
        else s"CAST($inner AS VARCHAR)"
      cols.map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  COUNT(DISTINCT $c) AS n_distinct,
        |  ${render(s"MIN($c)", c)} AS min_val,
        |  ${render(s"MAX($c)", c)} AS max_val
        |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    })

  /** CORPUS MANIFEST — the reproducibility receipt a training run pins
    * its dataset to (and the equality check two runs compare): per
    * content shard (fingerprint-prefix-bucketed) the doc count, token
    * total, and a shard digest over the SORTED fingerprints; plus one
    * corpus-level Merkle root = md5 over the sorted shard digests,
    * repeated on every row (the driver-friendly way to emit a scalar
    * beside a table). Any single-document change — content, addition,
    * removal — flips its shard digest and the root.
    *
    * Scale shape: this is WHY the digest is two-level — a flat
    * md5(all sorted fingerprints) needs a corpus-wide ordered reduction
    * into one reducer; here fingerprints sort WITHIN 16 shards
    * (parallel, bounded), and the root reduces 16 digests. At 100 TB
    * raise the prefix width (shards = 16^k) — depth stays 2. */
  private lazy val profileManifest = QueryDef(
    (s, dir) => {
      val docs = Tables.documentsSpread(s, dir)
        .select(col("doc_id"), md5(col("text")).as("fp"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("shard", substring(col("fp"), 1, 1))
      val shards = docs.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
          md5(concat_ws("", sort_array(collect_list(col("fp")))))
            .as("shard_digest"))
      val root = shards
        .agg(md5(concat_ws("", sort_array(collect_list(col("shard_digest")))))
          .as("corpus_root"))
      shards.crossJoin(broadcast(root)).orderBy("shard")
    },
    Some("""WITH f AS (
      |  SELECT md5(text) AS fp,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |s AS (
      |  SELECT substring(fp, 1, 1) AS shard, COUNT(*) AS n_docs,
      |         CAST(SUM(n_tokens) AS BIGINT) AS tokens,
      |         md5(string_agg(fp, '' ORDER BY fp)) AS shard_digest
      |  FROM f GROUP BY 1),
      |r AS (
      |  SELECT md5(string_agg(shard_digest, '' ORDER BY shard_digest))
      |           AS corpus_root
      |  FROM s)
      |SELECT shard, n_docs, tokens, shard_digest, corpus_root
      |FROM s, r ORDER BY shard""".stripMargin))

  /** CORPUS DIFF — what changed between two dataset snapshots, by
    * content: full-outer join of the two fingerprint projections keyed
    * on doc_id, each row classified added / removed / modified /
    * unchanged. The ops primitive behind "what did this crawl refresh
    * actually change" and the audit step before re-running an expensive
    * curation pass (skip unchanged). General form; the fixture query
    * derives both snapshots from `documents` deterministically
    * (prev = id%7≠0, curr = id%5≠0 with id%11=0 texts edited) so the
    * oracle shares the derivation.
    *
    * Shape at 100 TB: both sides reduce to (doc_id, md5) projections
    * before the join — fingerprint-sized, never the texts; the join is
    * one co-partitioned shuffle on doc_id (bucketed snapshot storage
    * makes it exchange-free, the IncrementalDedup catalog stance); the
    * summary is a map-side-combined 4-row groupBy. */
  def corpusDiff(prev: DataFrame, curr: DataFrame): DataFrame = {
    val p = prev.select(col("doc_id"), md5(col("text")).as("fp_prev"))
    val c = curr.select(col("doc_id"), md5(col("text")).as("fp_curr"))
    p.join(c, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_prev").isNull, lit("added"))
          .when(col("fp_curr").isNull, lit("removed"))
          .when(col("fp_prev") === col("fp_curr"), lit("unchanged"))
          .otherwise(lit("modified")))
  }

  private val corpusDiffQuery = QueryDef(
    (s, dir) => {
      val docs = Tables.documentsSpread(s, dir)
      val prev = docs.filter(col("doc_id") % 7 =!= 0)
      val curr = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
      corpusDiff(prev, curr)
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
        .orderBy("status")
    },
    Some("""WITH prev AS (
      |  SELECT doc_id, md5(text) AS fp_prev FROM documents WHERE doc_id % 7 <> 0),
      |curr AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END)
      |      AS fp_curr
      |  FROM documents WHERE doc_id % 5 <> 0),
      |d AS (
      |  SELECT COALESCE(prev.doc_id, curr.doc_id) AS doc_id,
      |    CASE WHEN fp_prev IS NULL THEN 'added'
      |         WHEN fp_curr IS NULL THEN 'removed'
      |         WHEN fp_prev = fp_curr THEN 'unchanged'
      |         ELSE 'modified' END AS status
      |  FROM prev FULL OUTER JOIN curr ON prev.doc_id = curr.doc_id)
      |SELECT status, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
      |FROM d GROUP BY status ORDER BY status""".stripMargin))

  /** N-GRAM NOVELTY curve — per document (in doc_id ingest order), the
    * fraction of its distinct 3-gram shingles seen in NO earlier
    * document: the corpus-saturation signal (novelty decaying toward
    * zero says new data is re-treading old ground — the diminishing-
    * returns curve crawl scheduling watches). Shares [[Dedup]]'s
    * shingle definition so "gram" means the same thing as in every
    * dedup operator.
    *
    * Determinism: first-occurrence is `min(doc_id)` per gram (exact),
    * the ratio is the integer fixed point `(n_novel·10⁴) div n_grams`.
    *
    * Shape at 100 TB: one gram explode feeds TWO map-side-combined
    * aggregates — `min(doc_id)` per gram (vocabulary-sized, the
    * df-table shape) re-aggregated by its winning doc into per-doc
    * novel counts, and the per-doc gram totals — joined DOC-sized:
    * the exploded gram stream never joins back (the naive gram-keyed
    * join-back the twin spells out would shuffle every occurrence
    * twice). Nothing is quadratic and nothing sorts globally. */
  private val profileNgramNovelty = QueryDef(
    (s, dir) => {
      // TWO aggregates consume the gram stream — materialize the
      // expensive per-doc shingle computation ONCE (the dedup_containment
      // localCheckpoint precedent; doc-count rows of arrays)
      val docs = Tables.documentsSpread(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= Dedup.ShingleN)
        .withColumn("sh", Dedup.shinglesExpr)
        .select("doc_id", "sh")
        .localCheckpoint()
      val ex = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      val novel = ex.groupBy("g").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
      ex.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        .join(novel, Seq("doc_id"), "left_outer")
        .na.fill(0L, Seq("n_novel"))
        .withColumn("novelty_fp", expr("(n_novel * 10000) div n_grams"))
        .select("doc_id", "n_grams", "n_novel", "novelty_fp")
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |d AS (
      |  SELECT doc_id, ${Dedup.shinglesSql} AS sh FROM t
      |  WHERE len(toks) >= ${Dedup.ShingleN}),
      |ex AS (SELECT doc_id, unnest(sh) AS g FROM d),
      |f AS (SELECT g, MIN(doc_id) AS first_doc FROM ex GROUP BY g)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN first_doc = ex.doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  CAST((SUM(CASE WHEN first_doc = ex.doc_id THEN 1 ELSE 0 END) * 10000)
      |    // COUNT(*) AS BIGINT) AS novelty_fp
      |FROM ex JOIN f USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** EQUI-DEPTH histogram (deciles) of a fact-table measure — the
    * `mix_quality_buckets` distributed-prefix-sum machinery applied to
    * RELATIONAL data (`lineitem.l_extendedprice`): the statistics
    * object an optimizer or data-quality monitor keeps per column,
    * computed with no global sort. Values move as EXACT INTEGER CENTS
    * (the q22 discipline); slots are `cents div 65536` (≤161 for this
    * domain), ranks are per-slot windows, offsets come from the
    * metadata-sized histogram, decile = rank·10 div N ≡ the oracle's
    * one-window row_number arithmetic. Tie order is total
    * (cents, l_orderkey, l_linenumber). */
  private val profileEquidepthPrice = QueryDef(
    (s, dir) => {
      val rows = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
        .withColumn("slot", expr("cast(cents div 65536 as int)"))
      val intra = Window.partitionBy("slot")
        .orderBy("cents", "l_orderkey", "l_linenumber")
      val ranked = rows.withColumn("intra", row_number().over(intra).cast("long"))
      val offs = rows.groupBy("slot").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.orderBy("slot").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("total", sum(col("cnt")).over(
          Window.orderBy("slot").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("slot").as("o_slot"), col("off"), col("total"))
      ranked.join(broadcast(offs), col("slot") === col("o_slot"))
        .withColumn("r", col("off") + col("intra") - 1)
        .withColumn("decile", expr("cast((r * 10) div total as int)"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_rows"),
          min("cents").as("min_cents"), max("cents").as("max_cents"))
        .orderBy("decile")
    },
    Some("""WITH c AS (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |r AS (
      |  SELECT cents,
      |         row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber) - 1
      |           AS r,
      |         COUNT(*) OVER () AS total
      |  FROM c)
      |SELECT CAST((r * 10) // total AS INT) AS decile,
      |       COUNT(*) AS n_rows, MIN(cents) AS min_cents, MAX(cents) AS max_cents
      |FROM r GROUP BY 1 ORDER BY decile""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "corpus_diff" -> corpusDiffQuery,
    "profile_ngram_novelty" -> profileNgramNovelty,
    "profile_equidepth_price" -> profileEquidepthPrice,
    "profile_manifest" -> profileManifest,
    "profile_schema" -> profileSchema,
    "profile_documents" -> profileDocuments,
    "profile_doc_duplication" -> profileDocDuplication,
    "profile_ngram_topk" -> profileNgramTopk,
    "profile_span_overlap" -> profileSpanOverlap,
    "profile_vocab" -> profileVocab)
}
