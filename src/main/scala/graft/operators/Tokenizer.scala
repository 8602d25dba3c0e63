package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Tokenizer-training operators — the byte-pair-encoding merge-learning
 * step (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
 * with Subword Units"; the BPE/WordPiece family every LLM vocabulary is
 * built with): start from characters, repeatedly merge the most frequent
 * adjacent symbol pair, weighted by word frequency.
 *
 * Semantics note (defined, deterministic, engine-identical): a merge
 * rewrites each word's symbol sequence with `replace(' '||seg||' ',
 * ' l r ', ' lr ')` — ONE left-to-right pass, non-overlapping matches
 * ON THE PADDED STRING, each match consuming its trailing separator.
 * Both engines (and the suite's Scala replay) share these exact
 * semantics. It equals textbook BPE except when the same pair repeats
 * back-to-back inside one word ("l r l r": textbook merges both, the
 * single pass merges alternate occurrences because the shared separator
 * is consumed) — a defined, rare deviation, not nondeterminism. Pair
 * ties break lexicographically.
 *
 * Shape at 100 TB: the corpus reduces ONCE to its (word, count)
 * VOCABULARY (map-side-combined groupBy — the LM-table reduction); every
 * merge round is a positional pair explode + ONE map-side-combined pair
 * count over vocabulary-sized data, a 1-row argmax collect (the
 * driver-held-literal stance), and a narrow per-row rewrite. Rounds are
 * FIXED (merge budget), so the driver loop does no convergence probing.
 */
object Tokenizer {

  private val Merges = 5

  /** Space-join each word's characters — the BPE start state. Works per
    * CHARACTER (substring is character-based in both engines), so
    * multi-byte scripts segment correctly. */
  private def charSeg(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws(" ", split(w, ""))

  /** Run the BPE training loop over `docs`' token vocabulary: returns
    * the learned merges AND the final vocabulary state. The final
    * (word, seg) pairs ARE the trained tokenizer's segmentation table —
    * what [[all]]'s `tokenize_bpe_encode` applies back to the corpus.
    * The vocabulary frames carry the raw word through every rewrite so
    * the segmentation stays joinable. */
  private def train(s: SparkSession, docs: DataFrame)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val vocab0 = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .select(col("w"), charSeg(col("w")).as("seg"), col("wcnt"))
    var vocab = vocab0.persist()
    // r20 opt: no standalone materialization actions. Each round's argmax
    // collect is the job that fills the CURRENT vocab state's cache (the
    // rewrite computes inline over the cached predecessor); the
    // predecessor retires only AFTER that materialization, so nothing is
    // ever recomputed through lineage. One job per merge round instead of
    // two (the old shape ran argmax + a count() per round: 11 jobs for 5
    // merges, now 6) — at 100 TB that is one vocabulary pass per round,
    // not two.
    var retired: Option[DataFrame] = None
    val merges = (1 to Merges).map { rank =>
      val top = vocab
        .select(col("wcnt"), split(col("seg"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("wcnt"), explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] as l, toks[i + 1] as r))"))
          .as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum("wcnt").as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()(0)
      // the collect above materialized `vocab`'s cache — its input state
      // can retire now without any risk of lineage recomputation
      retired.foreach(_.unpersist(blocking = false))
      val (l, r, c) = (top.getString(0), top.getString(1), top.getLong(2))
      // learned symbols are DATA interpolated into a SQL literal —
      // escape quote/backslash or a corpus token containing either
      // breaks (or corrupts) the rewrite expression
      def esc(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
      val (lq, rq) = (esc(l), esc(r))
      val next = vocab
        .select(col("w"), expr(
          s"trim(replace(' ' || seg || ' ', ' ${lq} ${rq} ', ' ${lq}${rq} '))")
          .as("seg"), col("wcnt"))
        .persist()
      retired = Some(vocab)
      vocab = next
      (rank, l, r, c)
    }
    // Materialize the FINAL state before retiring its input: consumers
    // (the encode/units joins, or bpeMerges' immediate unpersist) must
    // see a pinned table, never a lineage chain into unpersisted frames.
    vocab.count()
    retired.foreach(_.unpersist(blocking = false))
    (merges, vocab)
  }

  /** Learn [[Merges]] BPE merges over `docs`' token vocabulary; returns
    * (merge_rank, lhs, rhs, pair_count). */
  private[operators] def bpeMerges(s: SparkSession, docs: DataFrame): DataFrame = {
    val (merges, vocab) = train(s, docs)
    vocab.unpersist()
    import s.implicits._
    s.createDataset(merges).toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** One DuckDB merge round: given CTE `v$i(seg, wcnt)`, emit `m$i`
    * (the argmax pair) and `v${i+1}` (the rewritten vocabulary). */
  // MATERIALIZED throughout: each m$i is referenced 3× (the scalar
  // subqueries in the rewrite) and each v$i twice — inlined (DuckDB's
  // default), the chain re-expands ~3^rounds and the oracle runs for
  // minutes; materialized, every round computes once (the Similarity PQ
  // codebook lesson applied to the BPE loop).
  private def roundSql(i: Int): String =
    s"""m$i AS MATERIALIZED (
      |  SELECT l AS lhs, r AS rhs, CAST(SUM(wcnt) AS BIGINT) AS pair_count
      |  FROM (
      |    SELECT wcnt, toks[i + 1] AS l, toks[i + 2] AS r
      |    FROM (SELECT wcnt, string_split(seg, ' ') AS toks FROM v$i),
      |         unnest(range(0, len(toks) - 1)) AS t(i)
      |    WHERE len(toks) >= 2)
      |  GROUP BY 1, 2
      |  ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
      |v${i + 1} AS MATERIALIZED (
      |  SELECT w, trim(replace(' ' || seg || ' ',
      |           ' ' || (SELECT lhs FROM m$i) || ' ' || (SELECT rhs FROM m$i) || ' ',
      |           ' ' || (SELECT lhs FROM m$i) || (SELECT rhs FROM m$i) || ' '))
      |           AS seg, wcnt
      |  FROM v$i)""".stripMargin

  /** The shared v1..v[[Merges]]+1 training CTE chain (w carried through
    * every rewrite) — composed by BOTH the merges oracle and the encode
    * oracle so the two can never train different tokenizers. */
  private def trainSqlCtes: String = {
    val rounds = (1 to Merges).map(roundSql).mkString(",\n")
    s"""v1 AS MATERIALIZED (
      |  SELECT w, array_to_string(list_transform(range(1, len(w) + 1),
      |           i -> substring(w, i, 1)), ' ') AS seg,
      |         CAST(COUNT(*) AS BIGINT) AS wcnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0 GROUP BY w),
      |$rounds""".stripMargin
  }

  private val vocabBpeMerges = QueryDef(
    (s, dir) => bpeMerges(s, Tables.documentsSpread(s, dir)),
    Some {
      val union = (1 to Merges)
        .map(i => s"SELECT $i AS merge_rank, lhs, rhs, pair_count FROM m$i")
        .mkString("\nUNION ALL\n")
      s"""WITH $trainSqlCtes
        |$union
        |ORDER BY merge_rank""".stripMargin
    })

  /** ENCODE with the trained tokenizer: per-document subword-unit count
    * (the number every budget/packing decision needs under the REAL
    * vocabulary, not the `text_tokens` ceil(len/4) estimate). The final
    * training state's (word, seg) pairs ARE the tokenizer — encoding is
    * a vocabulary join, not a per-document merge replay.
    *
    * Shape at 100 TB: training reduces the corpus once to its
    * vocabulary (the [[bpeMerges]] shape); the segmentation table is
    * vocabulary-sized and BROADCASTS to the corpus token stream — the
    * corpus never shuffles, and per-doc unit counts are one map-side-
    * combined rollup. */
  private lazy val tokenizeBpeEncode = QueryDef(
    (s, dir) => {
      val docs = Tables.documentsSpread(s, dir)
      val (_, vocab) = train(s, docs)
      // eager localCheckpoint then RELEASE the training cache: without
      // this the final vocab stays persisted for the session lifetime
      // (bpeMerges unpersists; this path must too). Checkpoint blocks
      // are ContextCleaner-reclaimed once the plan is GC'd.
      val units = vocab
        .select(col("w"), size(split(col("seg"), " ")).cast("long").as("n_units"))
        .localCheckpoint()
      vocab.unpersist(blocking = false)
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .join(broadcast(units), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_units").as("n_bpe_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $trainSqlCtes,
      |enc AS (
      |  SELECT w, CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_units
      |  FROM v${Merges + 1}),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |SELECT doc_id, COUNT(*) AS n_words,
      |       CAST(SUM(n_units) AS BIGINT) AS n_bpe_tokens
      |FROM tok JOIN enc USING (w)
      |WHERE len(w) > 0
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** The UNIT VOCABULARY the trained tokenizer ships: every distinct
    * subword unit of the final segmentation state, with its
    * corpus-weighted occurrence count and a deterministic integer id
    * (the id↔unit table an embedding layer is sized against — the
    * artifact `tokenize_bpe_encode` counts under, made inspectable).
    * Ids are dense ranks over `(occurrences DESC, unit)` — frequency
    * order, the convention real tokenizers use so low ids are hot.
    *
    * Shape at 100 TB: the unit explode runs over the VOCABULARY (already
    * corpus-reduced by training), so everything after `train` is
    * vocabulary-sized — one map-side-combined rollup and a head sort. */
  private lazy val tokenizeVocabUnits = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documentsSpread(s, dir)
      val (_, vocab) = train(s, docs)
      val units = vocab
        .select(col("wcnt"), explode(split(col("seg"), " ")).as("unit"))
        .groupBy("unit")
        .agg(count(lit(1)).as("n_words"), sum("wcnt").as("occurrences"))
        .localCheckpoint() // release the training cache (the encode stance)
      vocab.unpersist(blocking = false)
      units
        .withColumn("unit_id", row_number().over(
          Window.orderBy(col("occurrences").desc, col("unit"))).cast("long"))
        .select(col("unit_id"), col("unit"), col("n_words"), col("occurrences"))
        .orderBy("unit_id")
    },
    Some(s"""WITH $trainSqlCtes,
      |u AS (
      |  SELECT unnest(string_split(seg, ' ')) AS unit, wcnt
      |  FROM v${Merges + 1}),
      |agg AS (
      |  SELECT unit, CAST(COUNT(*) AS BIGINT) AS n_words,
      |         CAST(SUM(wcnt) AS BIGINT) AS occurrences
      |  FROM u GROUP BY unit)
      |SELECT CAST(row_number() OVER (ORDER BY occurrences DESC, unit) AS BIGINT)
      |         AS unit_id,
      |       unit, n_words, occurrences
      |FROM agg ORDER BY unit_id""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "vocab_bpe_merges" -> vocabBpeMerges,
    "tokenize_bpe_encode" -> tokenizeBpeEncode,
    "tokenize_vocab_units" -> tokenizeVocabUnits)
}
