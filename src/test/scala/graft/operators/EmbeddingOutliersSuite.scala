package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/**
 * Semantics + plan shape of `embedding_outliers` (the centroid-similarity
 * tail pruning report: outlier / prototype deciles per quantizer cell).
 *
 * The DuckDB oracle pins row values; this suite pins (a) the MEANING of
 * the tails against an independent per-cell recomputation that sorts the
 * actual similarities instead of histogramming them, and (b) the scale
 * shape: the corpus→tails join-back is a BROADCAST join (the tail table
 * is (cell, slot) metadata, never a corpus-sized shuffle side).
 */
class EmbeddingOutliersSuite extends SparkSuite {

  // the production knob, not a copy — a quantizer resize cannot desync
  private val NumCentroids = Similarity.NumCentroids

  private def collectJoins(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => collectJoins(a.executedPlan)
      case q: QueryStageExec        => collectJoins(q.plan)
      case other => other.children.flatMap(collectJoins)
    }
    p match {
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => p +: here
      case _ => here
    }
  }

  test("embedding_outliers tails are exactly the slot-aligned cell deciles") {
    val df = SparkEntry.queries("embedding_outliers")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    // independent assignment snapshot (the suite recomputes assignment the
    // same way SemanticDedupSuite does, then derives tails by SORTING the
    // per-cell slots rather than window-cumsumming a histogram)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(Similarity.dotCol("embedding", "embedding")))
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
          col("nrm").as("cnrm")))
    val assigned = Similarity.assignCellsWithSim(emb, cents)
      .select("vec_id", "cell", "csim").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 500).toLong + 500L))

    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cell, rows) =>
      val n = rows.length
      val bySlot = rows.groupBy(_._3).view.mapValues(_.length).toMap
      val slots = bySlot.keys.toSeq.sorted
      // lowest slots whose cumulative count fits in the bottom decile
      def tailSlots(ordered: Seq[Long]): Set[Long] = {
        var cum = 0L
        ordered.takeWhile { s => cum += bySlot(s); cum <= n / 10 }.toSet
      }
      val lo = tailSlots(slots)
      val hi = tailSlots(slots.reverse)
      rows.flatMap { case (id, _, slot) =>
        (if (lo(slot)) Seq((id, cell, "outlier")) else Nil) ++
          (if (hi(slot)) Seq((id, cell, "prototype")) else Nil)
      }
    }.toSet

    assert(expected.nonEmpty, "fixture must produce at least one tail row")
    assert(expected.exists(_._3 == "outlier") &&
      expected.exists(_._3 == "prototype"),
      "fixture must exercise both tails")
    assert(got.toSet == expected,
      s"tail membership mismatch: got ${got.toSet} expected $expected")
  }

  test("embedding_outliers joins the tail table back by broadcast") {
    val df = SparkEntry.queries("embedding_outliers")(spark, sfDir)
    df.collect() // materialize so AQE finalizes stages
    val joins = collectJoins(df.queryExecution.executedPlan)
    assert(joins.nonEmpty, "expected at least one join in the plan")
    assert(joins.forall(_.isInstanceOf[BroadcastHashJoinExec]),
      s"tail join-back must broadcast, got: ${joins.map(_.nodeName)}")
  }
}
