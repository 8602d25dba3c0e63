package graft

import org.apache.spark.sql.functions._

/**
 * The Heaps-law corpus face of [[ScaleCorpus]]: the fitted fixture's
 * word vocabulary is BOUNDED (31 words at every SF), so scaling claims
 * about vocabulary-sensitive operators (containment dedup's prefix
 * filtering above all) need a corpus whose vocabulary actually grows.
 * This suite pins the two properties the scaling sweep relies on: the
 * realized vocabulary grows ≈ T^β at the FITTED β (Heaps-from-Zipf),
 * and generation is seed-deterministic (same seed → same rows), so a
 * present corpus directory is always the same bytes.
 */
class ScaleCorpusSuite extends SparkSuite {

  // sf0.01 gives the fit a 500-doc source — small but past the noise
  // floor of the 1/16-prefix fit point
  private val srcDir = "/root/testdata/sf0.01"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("heaps").toString

  private def stats(dir: String): (Double, Double) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(split(col("text"), " ").as("toks"))
    val t = docs.agg(sum(size(col("toks")))).head().getLong(0).toDouble
    val v = docs.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0).toDouble
    (t, v)
  }

  test("heaps generator: realized vocabulary grows ~T^beta and never saturates in-range") {
    val out1 = tmp()
    val out4 = tmp()
    val hfit = ScaleCorpus.generateHeaps(spark, srcDir, out1, 1)
    ScaleCorpus.generateHeaps(spark, srcDir, out4, 4)
    assert(hfit.beta >= 0.35 && hfit.beta <= 0.85, s"implausible fit: $hfit")
    val (t1, v1) = stats(out1)
    val (t4, v4) = stats(out4)
    val realized = math.log(v4 / v1) / math.log(t4 / t1)
    // Zipf(1/beta) sampling realizes the Heaps exponent approximately;
    // the claim is growth at roughly the fitted rate, NOT saturation
    assert(math.abs(realized - hfit.beta) < 0.2,
      s"realized growth exponent $realized vs fitted ${hfit.beta}")
    assert(v4 > 1.5 * v1,
      s"vocabulary must keep growing at 4x tokens: $v1 -> $v4")
  }

  test("heaps generator is seed-deterministic") {
    val outA = tmp()
    val outB = tmp()
    ScaleCorpus.generateHeaps(spark, srcDir, outA, 1, seed = 99L)
    ScaleCorpus.generateHeaps(spark, srcDir, outB, 1, seed = 99L)
    val a = spark.read.parquet(s"$outA/documents.parquet")
      .orderBy("doc_id").collect().map(_.toString)
    val b = spark.read.parquet(s"$outB/documents.parquet")
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
    // planted exact duplicates survive at the fitted rate's shape:
    // dup rows REGENERATE their neighbor's text deterministically
    val dups = spark.read.parquet(s"$outA/documents.parquet")
      .groupBy("text").count().filter(col("count") >= 2).count()
    assert(dups >= 0) // rate is fitted; sf0.01 has none — just no crash
  }
}
