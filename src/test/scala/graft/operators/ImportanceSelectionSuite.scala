package graft.operators

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Invariants of the DSIR importance-weight op beyond the oracle row:
  * Mitchell-log exactness/monotonicity, and that the weight actually
  * ranks target-vocabulary docs above off-domain ones. */
class ImportanceSelectionSuite extends SparkSuite {

  private def mlog2(n: Long): Long = {
    // the suite's independent replica of the fixed-point Mitchell log
    val l = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val p = 1L << l
    l * 1048576L + ((n - p) * 1048576L) / p
  }

  test("Mitchell fixed-point log: exact at powers of two, monotonic, in-engine ≡ replica") {
    // engine evaluation of the same expression the operator uses
    val expr2 = "(length(bin(CAST(n AS BIGINT))) - 1)"
    val engine = spark.range(1, 5000).toDF("n")
      .selectExpr("n",
        s"$expr2 * 1048576 + ((n - shiftleft(CAST(1 AS BIGINT), $expr2)) * 1048576) div shiftleft(CAST(1 AS BIGINT), $expr2) AS m")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- 1L until 5000L) assert(engine(n) === mlog2(n), s"n=$n")
    for (k <- 0 to 12) assert(mlog2(1L << k) === k * 1048576L)
    for (n <- 2L until 5000L) assert(mlog2(n) >= mlog2(n - 1))
  }

  test("target-vocabulary docs outrank off-domain docs; weights are deterministic") {
    import spark.implicits._
    // target speaks {alpha..delta}; raw split between target-like and junk
    val tvocab = "alpha beta gamma delta alpha beta gamma delta"
    val docs = Seq(
      (1L, tvocab, "t"), (2L, tvocab, "t"), (3L, tvocab, "t"),
      (10L, "alpha beta gamma delta alpha beta", "r"), // target-like
      (11L, "zzq qqz zqz qzz zzq qqz", "r") // junk vocabulary
    ).toDF("doc_id", "text", "kind")
    val w = ImportanceSelection.dsirWeights(docs, col("kind") === "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet === Set(10L, 11L)) // raw docs only
    assert(w(10L) > w(11L),
      s"target-like doc must outrank junk: ${w(10L)} vs ${w(11L)}")
    val again = ImportanceSelection.dsirWeights(docs, col("kind") === "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === w)
  }

  test("sf query: every raw doc scored exactly once, no target docs, exact fixed-point weights") {
    val out = SparkEntry.queries("dsir_weights")(spark, sfDir).cache()
    val raw = graft.Tables.documents(spark, sfDir)
      .filter(!col("source").isin("src0", "src1", "src2"))
    assert(out.count() === raw.count())
    assert(out.select("doc_id").distinct().count() === out.count())
    // each weight times 2^20 must be integral — the exact-binary-scaling claim
    val nonIntegral = out
      .filter(abs(col("weight") * 1048576.0 - round(col("weight") * 1048576.0)) > 1e-6)
      .count()
    assert(nonIntegral === 0L)
    out.unpersist()
  }
}
