package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the embedding-curation samplers beyond their oracle
  * rows: full cluster coverage with the √-allocation (diversity sample)
  * and a driver-side brute-force pin for hard-negative mining. */
class EmbeddingCurationSuite extends SparkSuite {

  test("sample_diversity: every cell covered, ranks contiguous, sqrt allocation") {
    val picks = SparkEntry.queries("sample_diversity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byCell = picks.groupBy(_._2)
    // every cell of the assignment appears
    val assignedCells = Similarity.seededAssignedOf(
      Tables.embeddings(spark, sfDir))
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(byCell.keySet === assignedCells)
    byCell.foreach { case (cell, rows) =>
      val size = rows.head._3
      val expect = math.max(1L, math.sqrt(size.toDouble).floor.toLong)
      assert(rows.length.toLong === math.min(expect, size), s"cell $cell")
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length), s"cell $cell ranks")
    }
  }

  test("mine_hard_negatives: labels differ; top-1 matches driver brute force") {
    val rows = SparkEntry.queries("mine_hard_negatives")(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Int]("query_label") !=
      r.getAs[Int]("neighbor_label")))

    val emb = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      val q = r.getAs[Long]("query_id")
      val (_, qv, ql) = emb.find(_._1 == q).get
      val best = emb.filter(e => e._1 != q && e._3 != ql)
        .map(e => (-cos(qv, e._2), e._1)).min
      assert(r.getAs[Long]("neighbor_id") === best._2, s"query $q")
    }
  }
}
