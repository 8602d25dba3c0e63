package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor operators over the `embeddings` table
 * (64-dim float vectors).
 *
 *  - Brute-force cosine top-k: the correctness baseline. Queries broadcast
 *    (tiny), corpus streams — no shuffle of the corpus; top-k per query is
 *    a ranking window over (queries × corpus), which at 100 TB becomes a
 *    per-partition partial top-k + merge (TakeOrdered shape).
 *  - SRP-LSH (sign-random-projection): the scale path. Signatures are
 *    per-row arithmetic (no shuffle); the candidate join shuffles only
 *    (vec_id, 16-bit signature). Planes are deterministic ±1 vectors
 *    derived from md5, so the oracle reproduces them bit-for-bit.
 *
 * FP determinism: dot products are EXPLICIT left-associated 64-term sums
 * over doubles in both engines (no list_sum / HOF fold whose accumulation
 * order might differ), so similarity values hash-match exactly.
 */
object Similarity {

  private val Dim = 64
  private val NumQueries = 5
  private val TopK = 10

  /** Left-assoc Σ a[i]*b[i] over doubles. HOF form, NOT an unrolled
    * 64-term expression: aggregate(zip_with(...)) folds sequentially from
    * 0.0, which is bit-identical to the oracle's explicit left-associated
    * sum (0.0 + x1 == x1 exactly), while keeping the expression tree ~10
    * nodes — the unrolled form made janino codegen compilation, not the
    * data, the dominant bench cost. */
  private def dotCol(a: String, b: String): Column =
    aggregate(
      zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i =>
      s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)").mkString(" + ")

  private val annCosineTopk = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // single-file input = one partition; spread the O(Dim) per-row math.
      // sim via the native codegen'd expression (bit-identical to the HOF
      // fold and to the oracle's explicit sums).
      val emb = Tables.embeddings(s, dir).repartition(64)
      val corpus = emb.select(col("vec_id"), col("embedding").as("v"))
      val queries = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("neighbor_id"))
      broadcast(queries).join(corpus, col("vec_id") =!= col("query_id"))
        .withColumn("sim",
          graft.functions.VectorFunctions.cosineSimilarity(col("q"), col("v")))
        .withColumnRenamed("vec_id", "neighbor_id")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 4).as("sim"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH corpus AS (
      |  SELECT vec_id, embedding AS v,
      |         SQRT(${dotSql("embedding", "embedding")}) AS v_norm
      |  FROM embeddings),
      |queries AS (
      |  SELECT vec_id AS query_id, embedding AS q,
      |         SQRT(${dotSql("embedding", "embedding")}) AS q_norm
      |  FROM embeddings WHERE vec_id < $NumQueries),
      |scored AS (
      |  SELECT query_id, vec_id AS neighbor_id,
      |         (${dotSql("q", "v")}) / (q_norm * v_norm) AS sim
      |  FROM queries, corpus WHERE vec_id <> query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
      |       ROUND(sim, 4) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin))

  private val NumPlanes = 16

  /** Deterministic ±1 hyperplanes: sign(p,d) = +1 iff the first hex digit
    * of md5("srp:p:d") is < '8'. Same bits in any engine. */
  private[operators] def planeSign(p: Int, d: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srp:$p:$d".getBytes("UTF-8"))
    if (((digest(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** All 16 planes as ONE nested literal (a constant object at runtime —
    * nothing to codegen per element). */
  private lazy val planesLit: Column = typedLit(
    (0 until NumPlanes).map(p => (0 until Dim).map(d => planeSign(p, d).toDouble)))

  private def projCol(p: Int): Column =
    aggregate(
      zip_with(col("embedding"), element_at(planesLit, p + 1),
        (x, s) => x.cast("double") * s),
      lit(0.0), (acc, x) => acc + x)

  private def projSql(p: Int): String =
    (1 to Dim).map { i =>
      val s = planeSign(p, i - 1)
      s"CAST(embedding[$i] AS DOUBLE) * ($s.0)"
    }.mkString(" + ")

  private val annLshSrp = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val signature = (0 until NumPlanes).map { p =>
        when(projCol(p) >= 0, 1L << p).otherwise(0L)
      }.reduce(_ + _)
      Tables.embeddings(s, dir).repartition(64)
        .withColumn("signature", signature)
        .withColumn("bucket_size",
          count(lit(1)).over(Window.partitionBy("signature")))
        .select("vec_id", "signature", "bucket_size")
        .orderBy("vec_id")
    },
    Some {
      val sigSql = (0 until NumPlanes).map { p =>
        s"CASE WHEN (${projSql(p)}) >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH sig AS (
         |  SELECT vec_id, CAST($sigSql AS BIGINT) AS signature FROM embeddings)
         |SELECT vec_id, signature,
         |       count(*) OVER (PARTITION BY signature) AS bucket_size
         |FROM sig ORDER BY vec_id""".stripMargin
    })

  /** LSH-accelerated near-neighbor pairs: exact cosine, but only within a
    * signature bucket — the candidate set the SRP index admits. */
  private val annLshPairs = QueryDef(
    (s, dir) => {
      val signature = (0 until NumPlanes).map { p =>
        when(projCol(p) >= 0, 1L << p).otherwise(0L)
      }.reduce(_ + _)
      // Scale-safe plan (r1 verdict): a SHUFFLE HASH join on signature —
      // both sides hash-partitioned by the 16-bit signature, signature
      // materialized in the map-stage projection below each exchange. No
      // broadcast of the corpus (the r1 plan broadcast ALL of b — fine at
      // sf0.1, dead at 100 TB) and no sort-merge join (whose sort keys
      // re-evaluated the signature aggregate per comparison — 30s vs 6s).
      // signature+norm materialized below ONE signature-partitioned
      // exchange; both self-join aliases read that same exchange
      // (ReusedExchange), so the 16-fold projection runs once per row,
      // not once per side
      val sig = Tables.embeddings(s, dir).repartition(64)
        .withColumn("signature", signature)
        .withColumn("norm", sqrt(dotCol("embedding", "embedding")))
        .repartition(col("signature"))
      val a = sig.select(col("vec_id").as("vec_id_1"),
        col("signature"), col("embedding").as("e1"), col("norm").as("n1"))
      val b = sig.select(col("vec_id").as("vec_id_2"), col("signature"),
        col("embedding").as("e2"), col("norm").as("n2"))
      a.join(b.hint("shuffle_hash"), Seq("signature"))
        .filter(col("vec_id_1") < col("vec_id_2"))
        .withColumn("sim", dotCol("e1", "e2") / (col("n1") * col("n2")))
        .select(col("vec_id_1"), col("vec_id_2"), round(col("sim"), 4).as("sim"))
        .orderBy("vec_id_1", "vec_id_2")
    },
    Some {
      val sigSql = (0 until NumPlanes).map { p =>
        s"CASE WHEN (${projSql(p)}) >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH sig AS (
         |  SELECT vec_id, embedding, CAST($sigSql AS BIGINT) AS signature,
         |         SQRT(${dotSql("embedding", "embedding")}) AS norm
         |  FROM embeddings)
         |SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         |       ROUND((${dotSql("a.embedding", "b.embedding")}) / (a.norm * b.norm), 4) AS sim
         |FROM sig a JOIN sig b
         |  ON a.signature = b.signature AND a.vec_id < b.vec_id
         |ORDER BY vec_id_1, vec_id_2""".stripMargin
    })

  /** Embedding-cosine near-dup dedup: pairs over the similarity
    * threshold; the higher vec_id of each pair is the drop candidate,
    * keeping the lowest-id representative (greedy keeper rule).
    *
    * Candidates come from SRP banding (r1 verdict: the all-pairs
    * broadcast nested-loop join was O(N²) with the whole corpus on the
    * broadcast side — impossible at 100 TB). Banding: the 16 SRP planes
    * split into 4 bands of 4; two vectors are candidates iff they agree
    * on ALL 4 sign bits of ANY band. For cosine s the per-plane agreement
    * probability is p = 1 − acos(s)/π, so recall = 1 − (1 − p⁴)⁴ ≈ 0.54
    * at s = 0.45 (this threshold) and ≈ 0.96 at s = 0.9 (true
    * near-dups). Misses are the documented LSH trade; every candidate is
    * verified with EXACT cosine so there are no false positives.
    *
    * Scale shape: band ids are per-row arithmetic below the exchange; the
    * candidate join shuffles (vec_id, band) only; embeddings are fetched
    * per candidate side via shuffle hash joins on vec_id — nothing
    * corpus-sized is ever broadcast and no all-pairs comparison exists. */
  private val NearDupThreshold = 0.45
  private val DedupBands = 4
  private val DedupRowsPerBand = NumPlanes / DedupBands

  /** Band id for band b: b*16 + the 4 sign bits of planes 4b..4b+3. */
  private def bandCol(b: Int): Column =
    (0 until DedupRowsPerBand).map { j =>
      when(projCol(DedupRowsPerBand * b + j) >= 0, 1L << j).otherwise(0L)
    }.reduce(_ + _) + lit(b * 16L)

  private def bandSql(b: Int): String = {
    val bits = (0 until DedupRowsPerBand).map { j =>
      s"CASE WHEN (${projSql(DedupRowsPerBand * b + j)}) >= 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"${b * 16} + $bits"
  }

  private val dedupEmbeddingCosine = QueryDef(
    (s, dir) => {
      // the native codegen'd expression (graft.functions.CosineSimilarity)
      // computes dot+norms in one tight loop per pair — bit-identical to
      // the HOF fold (VectorExpressionsSuite), so the oracle still matches
      val emb = Tables.embeddings(s, dir).repartition(64)
        .select(col("vec_id"), col("embedding"))
      // band ids materialized below one band-partitioned exchange shared
      // by both candidate-join sides (ReusedExchange)
      val bands = emb.select(col("vec_id"),
        explode(array((0 until DedupBands).map(bandCol): _*)).as("band"))
        .repartition(col("band"))
      val cand = bands.withColumnRenamed("vec_id", "vec_id_keeper")
        .join(bands.withColumnRenamed("vec_id", "vec_id_dropped").hint("shuffle_hash"), "band")
        .filter(col("vec_id_keeper") < col("vec_id_dropped"))
        .select("vec_id_keeper", "vec_id_dropped").distinct()
      cand
        .join(emb.select(col("vec_id").as("vec_id_keeper"),
          col("embedding").as("e1")).hint("shuffle_hash"), "vec_id_keeper")
        .join(emb.select(col("vec_id").as("vec_id_dropped"),
          col("embedding").as("e2")).hint("shuffle_hash"), "vec_id_dropped")
        .withColumn("sim",
          graft.functions.VectorFunctions.cosineSimilarity(col("e1"), col("e2")))
        .filter(col("sim") >= NearDupThreshold)
        .select(col("vec_id_keeper"), col("vec_id_dropped"),
          round(col("sim"), 4).as("sim"))
        .orderBy("vec_id_keeper", "vec_id_dropped")
    },
    Some(s"""WITH e AS (
      |  SELECT vec_id, embedding,
      |         SQRT(${dotSql("embedding", "embedding")}) AS norm
      |  FROM embeddings),
      |bands AS (
      |  SELECT vec_id, unnest([${(0 until DedupBands).map(bandSql).mkString(",\n    ")}]) AS band
      |  FROM embeddings),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS vec_id_keeper, b.vec_id AS vec_id_dropped
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.vec_id < b.vec_id)
      |SELECT c.vec_id_keeper, c.vec_id_dropped,
      |       ROUND((${dotSql("e1.embedding", "e2.embedding")}) / (e1.norm * e2.norm), 4) AS sim
      |FROM cand c
      |JOIN e e1 ON c.vec_id_keeper = e1.vec_id
      |JOIN e e2 ON c.vec_id_dropped = e2.vec_id
      |WHERE (${dotSql("e1.embedding", "e2.embedding")}) / (e1.norm * e2.norm) >= $NearDupThreshold
      |ORDER BY vec_id_keeper, vec_id_dropped""".stripMargin))

  private val NumCentroids = 8

  /** IVF-style ANN: a deterministic coarse quantizer (the first
    * `NumCentroids` vectors stand in for trained centroids — swap in
    * k-means output at scale), every vector assigned to its nearest
    * centroid (nlist=8), queries probe ONLY their own cell (nprobe=1) and
    * re-rank exactly inside it. The partition-by-cell shape is the scale
    * path: the corpus shuffles once on cell id, each probe touches
    * 1/nlist of the data. Recall loss vs brute force is inherent to
    * nprobe=1 — the oracle reproduces the same index, so results match. */
  private val annIvfTopk = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cos = graft.functions.VectorFunctions.cosineSimilarity _
      val emb = Tables.embeddings(s, dir).repartition(64)
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(col("csim").desc, col("cent_id"))
      val assigned = emb.join(broadcast(cents))
        .withColumn("csim", cos(col("embedding"), col("cvec")))
        .withColumn("arn", row_number().over(wAssign))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"))
      val queries = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("cell"),
          col("embedding").as("q"))
      val wRank = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("neighbor_id"))
      broadcast(queries)
        .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", cos(col("q"), col("embedding")))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= TopK)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 4).as("sim"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
      |  WHERE vec_id < $NumCentroids),
      |assigned AS (
      |  SELECT vec_id, cell, embedding FROM (
      |    SELECT e.vec_id, c.cent_id AS cell, e.embedding,
      |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |             (${dotSql("e.embedding", "c.cvec")}) /
      |             (SQRT(${dotSql("e.embedding", "e.embedding")}) *
      |              SQRT(${dotSql("c.cvec", "c.cvec")})) DESC, c.cent_id) AS arn
      |    FROM embeddings e, cents c)
      |  WHERE arn = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, cell, embedding AS q FROM assigned
      |  WHERE vec_id < $NumQueries),
      |scored AS (
      |  SELECT qu.query_id, a.vec_id AS neighbor_id,
      |         (${dotSql("qu.q", "a.embedding")}) /
      |         (SQRT(${dotSql("qu.q", "qu.q")}) *
      |          SQRT(${dotSql("a.embedding", "a.embedding")})) AS sim
      |  FROM queries qu JOIN assigned a
      |    ON qu.cell = a.cell AND a.vec_id <> qu.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
      |       ROUND(sim, 4) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin))

  /** IVF with TRAINED centroids and multi-cell probing (r1 stretch):
    * one Lloyd iteration from the deterministic seed (first `NumCentroids`
    * vectors), centroid components ROUNDED to 6 decimals on both engines
    * so the trained quantizer is bit-identical despite double-sum
    * ordering differences (the repo's standard FP-determinism trade —
    * see NOTES r1), then queries probe their `NProbe` nearest cells
    * instead of 1, recovering most of nprobe=1's recall loss. At scale:
    * training is one groupBy over (cell, 64 dims); assignment and probing
    * shuffle on cell id exactly like [[annIvfTopk]]. */
  private val NProbe = 2

  private val annIvfKmeansTopk = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // norms precomputed ONCE per relation (IEEE-identical to inlining:
      // same ops, same order — only evaluated once instead of per pair,
      // cutting the per-pair HOF folds from 3 to 1)
      val emb = Tables.embeddings(s, dir).repartition(64)
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm", sqrt(dotCol("embedding", "embedding")))
      val seeds = emb.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
          col("nrm").as("cnrm"))
      // points carry (vec_id, embedding, nrm); cents carry (cent_id, cvec, cnrm)
      def nearestCell(cents: DataFrame): DataFrame = {
        val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
        emb.join(broadcast(cents))
          .withColumn("csim", dotCol("embedding", "cvec") / (col("nrm") * col("cnrm")))
          .withColumn("arn", row_number().over(w))
          .filter(col("arn") === 1)
          .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"), col("nrm"))
      }
      // one Lloyd iteration: mean of each seed-assigned cell, rounded
      val trained = nearestCell(seeds).groupBy(col("cell").as("cent_id"))
        .agg(array((1 to Dim).map(i =>
          round(avg(element_at(col("embedding"), i).cast("double")), 6)): _*).as("cvec"))
        .withColumn("cnrm", sqrt(dotCol("cvec", "cvec")))
      val assigned = nearestCell(trained)
      val queries = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q"),
          col("nrm").as("qnrm"))
      // nprobe=2: per query, the 2 nearest trained cells
      val wProbe = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id"))
      val probes = queries.join(broadcast(trained))
        .withColumn("csim", dotCol("q", "cvec") / (col("qnrm") * col("cnrm")))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= NProbe)
        .select(col("query_id"), col("q"), col("qnrm"), col("cent_id").as("cell"))
      val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      broadcast(probes)
        .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", dotCol("q", "embedding") / (col("qnrm") * col("nrm")))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= TopK)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("sim"), 4).as("sim"))
        .orderBy("query_id", "rank")
    },
    Some {
      val trainedList = (1 to Dim)
        .map(i => s"ROUND(AVG(CAST(embedding[$i] AS DOUBLE)), 6)")
        .mkString("[", ",\n      ", "]")
      s"""WITH e AS (
      |  SELECT vec_id, embedding,
      |         SQRT(${dotSql("embedding", "embedding")}) AS nrm
      |  FROM embeddings),
      |seeds AS (
      |  SELECT vec_id AS cent_id, embedding AS cvec, nrm AS cnrm FROM e
      |  WHERE vec_id < $NumCentroids),
      |assigned0 AS (
      |  SELECT vec_id, cell, embedding FROM (
      |    SELECT e.vec_id, c.cent_id AS cell, e.embedding,
      |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |             (${dotSql("e.embedding", "c.cvec")}) / (e.nrm * c.cnrm) DESC,
      |             c.cent_id) AS arn
      |    FROM e, seeds c)
      |  WHERE arn = 1),
      |trained0 AS (
      |  SELECT cell AS cent_id, $trainedList AS cvec
      |  FROM assigned0 GROUP BY cell),
      |trained AS (
      |  SELECT cent_id, cvec, SQRT(${dotSql("cvec", "cvec")}) AS cnrm
      |  FROM trained0),
      |assigned AS (
      |  SELECT vec_id, cell, embedding, nrm FROM (
      |    SELECT e.vec_id, c.cent_id AS cell, e.embedding, e.nrm,
      |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |             (${dotSql("e.embedding", "c.cvec")}) / (e.nrm * c.cnrm) DESC,
      |             c.cent_id) AS arn
      |    FROM e, trained c)
      |  WHERE arn = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, embedding AS q, nrm AS qnrm FROM assigned
      |  WHERE vec_id < $NumQueries),
      |probes AS (
      |  SELECT query_id, q, qnrm, cell FROM (
      |    SELECT qu.query_id, qu.q, qu.qnrm, c.cent_id AS cell,
      |           row_number() OVER (PARTITION BY qu.query_id ORDER BY
      |             (${dotSql("qu.q", "c.cvec")}) / (qu.qnrm * c.cnrm) DESC,
      |             c.cent_id) AS prn
      |    FROM queries qu, trained c)
      |  WHERE prn <= $NProbe),
      |scored AS (
      |  SELECT p.query_id, a.vec_id AS neighbor_id,
      |         (${dotSql("p.q", "a.embedding")}) / (p.qnrm * a.nrm) AS sim
      |  FROM probes p JOIN assigned a
      |    ON p.cell = a.cell AND a.vec_id <> p.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, sim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
      |       ROUND(sim, 4) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    })

  val all: Map[String, QueryDef] = Map(
    "ann_cosine_topk" -> annCosineTopk,
    "ann_lsh_srp" -> annLshSrp,
    "ann_lsh_pairs" -> annLshPairs,
    "ann_ivf_topk" -> annIvfTopk,
    "ann_ivf_kmeans_topk" -> annIvfKmeansTopk,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine)
}
