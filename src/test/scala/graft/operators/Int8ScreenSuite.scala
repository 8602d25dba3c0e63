package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The int8 bound-prefilter's contract (r20): on the shuffle-hash
  * verify-fetch face, candidates are screened by a cosine UPPER BOUND
  * computed from 1 B/dim int8 codes before any raw-float fetch. The
  * screen must be LOSSLESS — no pair whose exact similarity clears the
  * threshold may ever be screened out — and transparent end-to-end:
  * either face of `dedup_embedding_cosine`/`dedup_semantic` returns
  * bit-identical rows (the DuckDB oracle never sees the screen). */
class Int8ScreenSuite extends SparkSuite {

  private val Tau = Similarity.NearDupThreshold

  private def withFace[A](face: String)(f: => A): A = {
    sys.props("graft.verifyFetchFace") = face
    try f finally sys.props.remove("graft.verifyFetchFace")
  }

  /** All unordered id pairs of a (vec_id, embedding) frame. */
  private def allPairs(emb: DataFrame): DataFrame = {
    val ids = emb.select(col("vec_id"))
    ids.select(col("vec_id").as("vec_id_1"))
      .crossJoin(ids.select(col("vec_id").as("vec_id_2")))
      .filter(col("vec_id_1") < col("vec_id_2"))
  }

  /** Pairs whose EXACT cosine clears the threshold — what the screen
    * must never lose. */
  private def exactSurvivors(emb: DataFrame, cand: DataFrame): DataFrame =
    cand
      .join(emb.select(col("vec_id").as("vec_id_1"), col("embedding").as("e1")),
        "vec_id_1")
      .join(emb.select(col("vec_id").as("vec_id_2"), col("embedding").as("e2")),
        "vec_id_2")
      .filter(graft.functions.VectorFunctions.cosineSimilarity(
        col("e1"), col("e2")) >= Tau)
      .select("vec_id_1", "vec_id_2")

  test("screen completeness on the driver corpus: every exact survivor passes the screen") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val cand = allPairs(emb)
    // n = MaxValue forces the shuffle-hash face (the decision reads the
    // caller-supplied sizing count) — no global state touched
    val screened = Similarity.int8Screen(emb, Long.MaxValue, cand,
      "vec_id_1", "vec_id_2")
    val lost = exactSurvivors(emb, cand)
      .join(screened, Seq("vec_id_1", "vec_id_2"), "left_anti")
    assert(lost.count() == 0L,
      s"screen lost true pairs: ${lost.collect().mkString(", ")}")
    // ...and it actually PRUNES (a vacuous screen would also pass above)
    val total = cand.count()
    val kept = screened.count()
    assert(kept < total, s"screen kept all $total candidates")
  }

  test("screen completeness on adversarial vectors incl. a zero vector, at dim 4") {
    import spark.implicits._
    // boundary shapes: exactly-threshold pairs, antipodal, orthogonal,
    // zero vector (NaN sim — dropped by BOTH the screen and the exact
    // filter), max-quantization-error coordinates (x = s·(q ± 1/2))
    val vecs = Seq(
      0L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Seq(0.45f, 0.8930f, 0.0f, 0.0f), // sim vs 0 ≈ exactly τ
      2L -> Seq(-1.0f, 0.0f, 0.0f, 0.0f),    // antipodal to 0
      3L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),     // orthogonal to 0
      4L -> Seq(0.0f, 0.0f, 0.0f, 0.0f),     // zero vector
      5L -> Seq(0.005f, 0.9999f, 0.005f, 0.005f), // rounds to code (1,127,1,1)-ish edges
      6L -> Seq(0.45001f, 0.893f, 0.0f, 0.0f),
      7L -> Seq(1.0f, 1.0f, 1.0f, 1.0f),
      8L -> Seq(127.5f, 255.0f, 0.5f, -0.5f) // half-ulp-of-scale coords
    ).toDF("vec_id", "embedding")
    val cand = allPairs(vecs)
    val screened = Similarity.int8Screen(vecs, Long.MaxValue, cand,
      "vec_id_1", "vec_id_2", dim = 4)
    val lost = exactSurvivors(vecs, cand)
      .join(screened, Seq("vec_id_1", "vec_id_2"), "left_anti")
    assert(lost.count() == 0L,
      s"screen lost true pairs: ${lost.collect().mkString(", ")}")
    // the zero vector's pairs are KEPT by both paths: Spark SQL orders
    // NaN above every double, so the exact verify's `NaN >= τ` retains
    // them — the screen must match that contract
    assert(screened.filter(col("vec_id_1") === 4L || col("vec_id_2") === 4L)
      .count() == 8L)
  }

  test("screen preserves candidate payload columns (the quantizer-cell csim contract)") {
    import spark.implicits._
    val vecs = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.9f, 0.1f)).toDF("vec_id", "embedding")
    val cand = Seq((0L, 1L, 0.7, 0.9)).toDF(
      "vec_id_1", "vec_id_2", "csim_1", "csim_2")
    val out = Similarity.int8Screen(vecs, Long.MaxValue, cand,
      "vec_id_1", "vec_id_2", dim = 2)
    assert(out.columns.sorted.toSeq ==
      Seq("csim_1", "csim_2", "vec_id_1", "vec_id_2"))
    assert(out.count() == 1L) // sim ≈ 0.99 ≥ τ — kept, payload intact
    assert(out.select("csim_2").as[Double].head() == 0.9)
  }

  test("end-to-end: shuffle face (screen active) ≡ broadcast face, both query families") {
    def rows(q: String, face: String): Seq[String] = withFace(face) {
      graft.SparkEntry.queries(q)(spark, sfDir).collect()
        .map(_.toString).toSeq.sorted
    }
    for (q <- Seq("dedup_embedding_cosine", "dedup_semantic")) {
      val b = rows(q, "broadcast")
      val sh = rows(q, "shuffle")
      assert(b == sh, s"$q diverged between faces: " +
        s"${b.diff(sh).take(3)} vs ${sh.diff(b).take(3)}")
      assert(b.nonEmpty)
    }
  }
}
