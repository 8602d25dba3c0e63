package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed-prefix-sum quintile assignment must equal the naive
  * global-window form exactly — same contract `pack_sequences` pins for
  * its seq ids, applied to quality ranking. */
class QualityBucketsSuite extends SparkSuite {

  test("prefix-sum quintiles equal the naive global row_number form") {
    val got = SparkEntry.queries("mix_quality_buckets")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val naive = TextAnalysis.qualityRaw(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        TextAnalysis.qualityScoreFp.as("score_fp"))
      .withColumn("r",
        row_number().over(Window.orderBy("score_fp", "doc_id")).cast("long") - 1)
      .withColumn("total", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("quintile", expr("cast((r * 5) div total as int)"))
      .groupBy("quintile")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
        min("score_fp").as("min_fp"), max("score_fp").as("max_fp"))
      .orderBy("quintile").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    assert(got.toSeq === naive.toSeq)
  }

  test("per-source prefix-sum quintiles equal the naive partitioned window form") {
    val got = SparkEntry.queries("mix_quality_by_source")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    val naive = TextAnalysis.qualityRaw(Tables.documents(spark, sfDir))
      .select(col("source"), col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        TextAnalysis.qualityScoreFp.as("score_fp"))
      .withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy("score_fp", "doc_id"))
        .cast("long") - 1)
      .withColumn("total", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("quintile", expr("cast((r * 5) div total as int)"))
      .groupBy("source", "quintile")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"),
        min("score_fp").as("min_fp"), max("score_fp").as("max_fp"))
      .orderBy("source", "quintile").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    assert(got.toSeq === naive.toSeq)
  }

  test("integer score_fp equals the exact rational half-up (driver-side third voice)") {
    // The pure-integer rewrite must compute floor(num/den + 1/2) of the
    // EXACT rational min(n,100)/100·(n−stops)/n·distinct/n — pinned here
    // against a BigInt reimplementation straight from the raw text, the
    // engine-independent third voice.
    val stops = Set("the", "a", "of", "and", "to")
    val got = TextAnalysis.qualityRaw(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text"), TextAnalysis.qualityScoreFp.as("int_fp"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val toks = r.getString(1).split(" ", -1).toSeq
      val n = BigInt(toks.size)
      val nStops = BigInt(toks.count(stops))
      val dst = BigInt(toks.distinct.size)
      val num = n.min(100) * (n - nStops) * dst * 10000
      val den = 100 * n * n
      val exact = (2 * num + den) / (2 * den)
      assert(BigInt(r.getLong(2)) == exact, s"doc ${r.getLong(0)}")
    }
  }

  test("the r9 float form diverges from the exact score only at .5 boundaries") {
    // Documents WHY the driver row was red for two rounds: the float
    // product lands a ULP under the exact value for docs sitting exactly
    // on a rounding boundary (e.g. docs 328/361 at sf0.001: exact score
    // 4485/2 and 4125/2, float product …4999999999995). Any doc where
    // the two forms disagree must be such a boundary doc, and the
    // divergence is exactly one fixed-point unit.
    val oldFloat = floor((least(col("n_tokens") / lit(100.0), lit(1.0)) *
      (lit(1.0) - col("stop_ratio")) * col("diversity")) * 1e4 + 0.5).cast("long")
    val boundary = TextAnalysis.qualityRaw(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n"),
        expr(s"CAST(size(filter(toks, t -> t IN (${TextAnalysis.stopList}))) AS BIGINT)").as("stops"),
        expr("CAST(size(array_distinct(toks)) AS BIGINT)").as("dst"),
        TextAnalysis.qualityScoreFp.as("int_fp"), oldFloat.as("float_fp"))
      .filter(col("int_fp") =!= col("float_fp"))
      .collect()
    boundary.foreach { r =>
      val (n, st, dst) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)), BigInt(r.getLong(3)))
      val num = n.min(100) * (n - st) * dst * 10000
      val den = 100 * n * n
      // exactly on the boundary: fractional part of num/den is 1/2
      assert((2 * num) % (2 * den) == den, s"doc ${r.getLong(0)} not a .5 boundary")
      assert(r.getLong(4) == r.getLong(5) + 1, s"doc ${r.getLong(0)} diverges by more than half-up")
    }
  }

  test("quintiles are rank-balanced and ordered by score range") {
    val rows = SparkEntry.queries("mix_quality_buckets")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val n = rows.map(_._2).sum
    assert(rows.map(_._1).toSeq === (0 until 5))
    rows.foreach { case (_, docs, _, _) =>
      assert(docs >= n / 5 && docs <= n / 5 + 1, rows.toSeq.toString)
    }
    // score ranges are non-overlapping and ascending (ties may touch)
    rows.sliding(2).foreach {
      case Array((_, _, _, hi0), (_, _, lo1, _)) => assert(hi0 <= lo1)
      case _ =>
    }
  }
}
