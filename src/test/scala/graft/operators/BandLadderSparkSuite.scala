package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * End-to-end pin of the FIRST ADAPTIVE RUNG (r19): the DuckDB
 * cross-check of the rung was scripted (4k corpus, pair-for-pair
 * equal); this suite pins the Spark side of the same contract inside
 * sbt — a 2,100-vector corpus (past the 2,048 floor boundary → rung
 * 7×63) with PLANTED near-duplicates must verify with zero false
 * positives, recall every planted pair (sim ≈ 0.999 ⇒ per-band
 * collision 0.986⁷ ≈ 0.91, miss probability (1−0.91)⁶³ ≈ 10⁻⁶⁴), and
 * hold the analytic recall floor against exhaustive brute force.
 */
class BandLadderSparkSuite extends SparkSuite {

  test("first adaptive rung end-to-end: zero FPs, planted pairs all recalled, recall ≥ floor") {
    import spark.implicits._
    val dim = 64
    val rnd = new java.util.SplittableRandom(20190816L)
    def vec(): Array[Float] =
      Array.fill(dim)(rnd.nextDouble(-1.0, 1.0).toFloat)
    val bases = Vector.fill(1050)(vec())
    val rows =
      bases.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
        bases.zipWithIndex.map { case (v, i) =>
          // a high-cosine copy: every base gets one true near-dup
          ((1050 + i).toLong,
            v.map(x => x + rnd.nextDouble(-0.05, 0.05).toFloat).toSeq)
        }
    assert(rows.size == 2100)
    assert(Similarity.adaptiveBandParams(rows.size.toLong) == (7, 63),
      "2,100 vectors must sit on the first adaptive rung")
    val dir = java.nio.file.Files.createTempDirectory("bandrung").toString
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val banded = Similarity.embeddingCosinePairs(spark, dir)
      .select("vec_id_keeper", "vec_id_dropped").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val exact = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      .crossJoin(e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("id1") < col("id2"))
      .filter(graft.functions.VectorFunctions.cosineSimilarity(
        col("e1"), col("e2")) >= 0.45)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // zero false positives at ANY rung (every candidate verifies exact)
    assert((banded -- exact).isEmpty,
      s"sub-threshold pairs emitted: ${(banded -- exact).take(5)}")
    // every planted near-dup pair (sim ≈ 0.999) is found
    val planted = (0 until 1050).map(i => (i.toLong, (1050 + i).toLong)).toSet
    assert((planted -- exact).isEmpty, "planting failed — copies below τ?")
    assert((planted -- banded).isEmpty,
      s"planted pairs missed: ${(planted -- banded).take(5)}")
    // overall measured recall holds the analytic floor
    val recall = (banded & exact).size.toDouble / exact.size
    info(f"rung 7×63 recall = $recall%.4f (${banded.size}/${exact.size})")
    assert(recall >= 0.95, f"rung recall $recall%.4f below floor")
  }
}
