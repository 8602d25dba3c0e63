package graft.operators

import graft.{SparkEntry, SparkSuite}

/**
 * Semantics of `mix_doremi` beyond the oracle's value pinning: the
 * linearized-exponential reweight must upweight exactly the domains
 * with positive excess loss, order boosts by excess, and keep both
 * share columns valid distributions.
 */
class MixDoremiSuite extends SparkSuite {

  test("doremi reweight boosts hard domains, orders by excess, sums to 1") {
    val rows = SparkEntry.queries("mix_doremi")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length > 1, "fixture needs multiple sources")
    assert(rows.exists(_._3 > 0), "fixture needs at least one hard domain")

    // boost ∝ 1 + η·excess before normalization, so: zero-excess domains
    // dilute below their baseline share, and boosts order by excess
    rows.foreach { case (src, _, excess, actual, doremi, boost) =>
      if (excess == 0L)
        assert(boost < 1.0 + 1e-9 && doremi <= actual + 1e-9,
          s"$src has zero excess but boosted: $actual -> $doremi")
    }
    // monotone across STRICTLY increasing excess groups: domains tied
    // on excess can differ at 4 dp (weight truncates per domain), so
    // within-tie boost order is unspecified — compare group extremes
    val groups = rows.groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (ex, g) => (ex, g.map(_._6)) }
    groups.sliding(2).foreach {
      case Seq((exLo, lo), (exHi, hi)) =>
        assert(lo.max <= hi.min + 1e-9,
          s"boost not monotone: excess $exLo boosts $lo vs excess $exHi boosts $hi")
      case _ =>
    }
    assert(rows.maxBy(_._3)._6 == rows.map(_._6).max,
      "hardest domain gets the largest boost")
    // both share columns are distributions (4-decimal rounding slack)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-2)
  }

  test("a bigram-less domain stays in the mixture with excess 0") {
    // all-single-token docs produce NO bigram rows — the domain has no
    // model loss, but it must still appear (excess 0, boost <= 1) and
    // count in the normalizations, not silently vanish (r17 advice; the
    // oracle shares any blind spot, so this pin is suite-side)
    import org.apache.spark.sql.functions._
    val dirPath = java.nio.file.Files.createTempDirectory("doremi-onetoken")
    try {
      val dir = dirPath.toString
      val docs = graft.Tables.documents(spark, sfDir)
      docs.unionByName(
          docs.limit(3).withColumn("doc_id", col("doc_id") + 1000000L)
            .withColumn("source", lit("terse"))
            .withColumn("text", lit("word")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("mix_doremi")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
      val terse = rows.find(_._1 == "terse")
      assert(terse.nonEmpty, s"bigram-less domain dropped: ${rows.map(_._1).toSeq}")
      val (_, tokens, excess, boost) = terse.get
      assert(tokens == 3L && excess == 0L && boost <= 1.0 + 1e-9,
        s"terse domain: tokens=$tokens excess=$excess boost=$boost")
    } finally {
      import java.nio.file.Files
      import scala.jdk.CollectionConverters._
      Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
