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
