package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines: exact,
 * n-gram-Jaccard, MinHash+LSH, SimHash.
 *
 * 100 TB design notes:
 *  - exact dedup = one hash-partitioned groupBy on the content hash —
 *    the minimum possible shuffle (hash only, not full text);
 *  - pairwise Jaccard is NEVER all-pairs: candidate pairs come from a
 *    blocking key (here lang × length band; at scale: MinHash LSH bands),
 *    so the self-join shuffles on the blocking key and the quadratic blow
 *    up is bounded per block;
 *  - MinHash signatures are per-row HOF computations (no explode, no
 *    shuffle); only the band → candidate-pair join shuffles, on short
 *    band hashes;
 *  - SimHash aggregates token-bit contributions with a map-side-combined
 *    explode+groupBy (shuffles (doc_id, 16 ints), not text).
 */
object Dedup {

  /** 3-token shingles of the single-space text, distinct. Spark arrays are
    * 0-indexed (DuckDB oracle uses 1-indexed lists). Safe for docs with
    * < 3 tokens (empty result). */
  private def shinglesExpr: Column =
    expr("""CASE WHEN size(toks) < 3 THEN array()
           |ELSE array_distinct(transform(sequence(0, size(toks) - 3),
           |       i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) END""".stripMargin)

  private val shinglesSql =
    """CASE WHEN len(toks) < 3 THEN []
      |ELSE list_distinct(list_transform(range(1, len(toks) - 1),
      |       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END""".stripMargin

  /** Exact dedup: group by content hash, keep lowest doc_id. */
  private val dedupExact = QueryDef(
    (s, dir) => Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("fingerprint"),
    Some("""SELECT md5(text) AS fingerprint, MIN(doc_id) AS keeper_doc_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY fingerprint""".stripMargin))

  /** Blocked pairwise n-gram Jaccard: candidates share (lang, token-count
    * band); near-dup when shingle-set Jaccard >= 0.8. */
  private val dedupNgramJaccard = QueryDef(
    (s, dir) => {
      val base = Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("sh", shinglesExpr)
        .withColumn("band", (size(col("toks")) / 50).cast("long"))
        .select("doc_id", "lang", "band", "sh")
      val a = base.select(col("doc_id").as("doc_id_1"), col("lang"),
        col("band"), col("sh").as("sh1"))
      val b = base.select(col("doc_id").as("doc_id_2"), col("lang"),
        col("band"), col("sh").as("sh2"))
      // Scale fixes, all semantics-preserving (verified: identical oracle):
      //  1. documents is one small parquet file = ONE input partition, and
      //     a broadcast-hash join inherits probe-side partitioning — so the
      //     whole quadratic block-join ran in a single task (78s at sf0.1).
      //     An explicit-count round-robin repartition (AQE never coalesces
      //     user-numbered repartitions) spreads probe rows — and therefore
      //     pairs — across all cores. The shuffle moves only 5k raw rows;
      //     shingle arrays are computed above the exchange, once per row.
      //  2. Ratio guard: j <= min/max for sets, so j >= 0.8 implies
      //     min(|sh1|,|sh2|) >= 0.8*max(...) — integer-cheap, halves the
      //     pairs reaching array_intersect, zero recall loss.
      //  3. Integer threshold instead of a jaccard-expression filter:
      //     i/(n1+n2-i) >= 0.8  <=>  9i >= 4(n1+n2), so the expensive
      //     array_intersect is evaluated once per candidate pair in the
      //     filter; the double-valued jaccard is recomputed only for the
      //     handful of survivors.
      val a2 = a.repartition(64)
      a2.join(b, Seq("lang", "band"))
        .filter(col("doc_id_1") < col("doc_id_2") &&
          least(size(col("sh1")), size(col("sh2"))) >=
            lit(0.8) * greatest(size(col("sh1")), size(col("sh2"))))
        .filter(lit(9) * size(array_intersect(col("sh1"), col("sh2"))) >=
          lit(4) * (size(col("sh1")) + size(col("sh2"))))
        .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("inter")))
        .select(col("doc_id_1"), col("doc_id_2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_id_1", "doc_id_2")
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |d AS (
      |  SELECT doc_id, lang, len(toks) // 50 AS band,
      |         $shinglesSql AS sh
      |  FROM t)
      |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
      |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
      |FROM d a JOIN d b
      |  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
      |ORDER BY doc_id_1, doc_id_2""".stripMargin))

  private val MinhashK = 8

  /** Per-doc MinHash signature: minhash_i = min over shingles of
    * md5(i:shingle). Lexicographic min over identical hex strings is
    * engine-independent. Pure per-row HOFs — zero shuffle. */
  private def minhashCols: Seq[Column] =
    (0 until MinhashK).map { i =>
      expr(s"CASE WHEN size(sh) = 0 THEN '' ELSE array_min(transform(sh, x -> md5(concat('$i:', x)))) END")
        .as(s"mh$i")
    }

  private def minhashSqlCols: String =
    (0 until MinhashK).map { i =>
      s"CASE WHEN len(sh) = 0 THEN '' ELSE list_min(list_transform(sh, x -> md5('$i:' || x))) END AS mh$i"
    }.mkString(",\n    ")

  private val dedupMinhash = QueryDef(
    // single-file input = one partition; spread the K*|shingles| md5 work
    // across cores before the per-row signature computation
    (s, dir) => Tables.documents(s, dir).repartition(64)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", shinglesExpr)
      .select(col("doc_id") +: minhashCols: _*)
      .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |d AS (SELECT doc_id, $shinglesSql AS sh FROM t)
      |SELECT doc_id,
      |    $minhashSqlCols
      |FROM d ORDER BY doc_id""".stripMargin))

  /** LSH candidate pairs: 2 bands of 4 minhashes; docs sharing any band
    * hash are candidates. The join key is a 32-char hash — at 100 TB this
    * is the shuffle, and it carries no document content. */
  private val dedupMinhashPairs = QueryDef(
    (s, dir) => {
      val sig = Tables.documents(s, dir).repartition(64)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("sh", shinglesExpr)
        .select(col("doc_id") +: minhashCols: _*)
        .withColumn("band0", md5(concat(col("mh0"), col("mh1"), col("mh2"), col("mh3"))))
        .withColumn("band1", md5(concat(col("mh4"), col("mh5"), col("mh6"), col("mh7"))))
      val bands = sig.select(col("doc_id"), explode(array(col("band0"), col("band1"))).as("band"))
      val a = bands.withColumnRenamed("doc_id", "doc_id_1")
      val b = bands.withColumnRenamed("doc_id", "doc_id_2")
      a.join(b, "band")
        .filter(col("doc_id_1") < col("doc_id_2"))
        .select("doc_id_1", "doc_id_2").distinct()
        .orderBy("doc_id_1", "doc_id_2")
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |d AS (SELECT doc_id, $shinglesSql AS sh FROM t),
      |sig AS (SELECT doc_id,
      |    $minhashSqlCols
      |  FROM d),
      |bands AS (
      |  SELECT doc_id, md5(mh0 || mh1 || mh2 || mh3) AS band FROM sig
      |  UNION ALL
      |  SELECT doc_id, md5(mh4 || mh5 || mh6 || mh7) AS band FROM sig)
      |SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
      |FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
      |ORDER BY doc_id_1, doc_id_2""".stripMargin))

  /** 16-bit SimHash over token hashes: bit b set iff the sum of ±1
    * contributions (from bit b of md5(token)) is >= 0. Explode + one
    * map-side-combined groupBy. */
  private val dedupSimhash = QueryDef(
    (s, dir) => {
      val toks = Tables.documents(s, dir).repartition(64)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", md5(col("tok")))
      val bitSums = (0 until 16).map { b =>
        val hexPos = b / 4 + 1
        val shift = 3 - b % 4
        val bit = expr(
          s"shiftright(instr('0123456789abcdef', substring(h, $hexPos, 1)) - 1, $shift) % 2")
        sum(when(bit === 1, 1).otherwise(-1)).as(s"s$b")
      }
      val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val simhash = (0 until 16).map { b =>
        when(col(s"s$b") >= 0, math.pow(2, b).toLong).otherwise(0L)
      }.reduce(_ + _)
      agg.select(col("doc_id"), simhash.as("simhash")).orderBy("doc_id")
    },
    Some {
      val bitSums = (0 until 16).map { b =>
        val hexPos = b / 4 + 1
        val shift = 3 - b % 4
        s"SUM(CASE WHEN ((instr('0123456789abcdef', substr(h, $hexPos, 1)) - 1) >> $shift) % 2 = 1 THEN 1 ELSE -1 END) AS s$b"
      }.mkString(",\n    ")
      val simhash = (0 until 16).map(b => s"CASE WHEN s$b >= 0 THEN ${math.pow(2, b).toLong} ELSE 0 END")
        .mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
         |agg AS (
         |  SELECT doc_id,
         |    $bitSums
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id, CAST($simhash AS BIGINT) AS simhash
         |FROM agg ORDER BY doc_id""".stripMargin
    })

  val all: Map[String, QueryDef] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash" -> dedupMinhash,
    "dedup_minhash_pairs" -> dedupMinhashPairs,
    "dedup_simhash" -> dedupSimhash)
}
