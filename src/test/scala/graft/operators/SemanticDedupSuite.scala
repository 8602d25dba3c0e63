package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/**
 * Set-level invariants of `dedup_semantic` (the SemDeDup-style
 * cluster-then-prune operator), checked against an independent
 * brute-force recomputation of within-cell duplicate pairs — the shape
 * the production query must NOT use, feasible here (sf0.001).
 *
 * The DuckDB oracle pins row values; this suite pins the SEMANTICS:
 * the dropped set is exactly "the less central member of every
 * within-cell pair at cosine >= threshold", so no duplicate pair
 * survives intact and nothing else is ever dropped.
 */
class SemanticDedupSuite extends SparkSuite {

  private val Threshold = 0.45
  // the production knob, not a copy — a quantizer resize cannot desync
  private val NumCentroids = Similarity.NumCentroids

  test("dedup_semantic drops exactly the less-central member of each within-cell duplicate pair") {
    val kept = SparkEntry.queries("dedup_semantic")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent assignment snapshot (vec_id -> cell, csim)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(Similarity.dotCol("embedding", "embedding")))
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
          col("nrm").as("cnrm")))
    val assigned = Similarity.assignCellsWithSim(emb, cents)
      .select("vec_id", "cell", "csim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cellOf = assigned.map(t => t._1 -> t._2).toMap
    val csimOf = assigned.map(t => t._1 -> t._3).toMap

    // brute-force within-cell duplicate pairs (test-only all-pairs)
    val e1 = emb.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val e2 = emb.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val dupPairs = e1.crossJoin(e2).filter(col("id1") < col("id2"))
      .filter(graft.functions.VectorFunctions.cosineSimilarity(
        col("e1"), col("e2")) >= Threshold)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cellOf(a) == cellOf(b) }

    assert(dupPairs.nonEmpty, "fixture must contain a within-cell duplicate pair")

    // ids are ordered in each pair, so a csim tie drops the higher id —
    // same rule as the query and its oracle
    val expectedDropped = dupPairs.map { case (a, b) =>
      if (csimOf(a) >= csimOf(b)) b else a
    }.toSet
    val actualDropped = cellOf.keySet -- kept.keySet

    assert(actualDropped == expectedDropped,
      s"dropped set mismatch: actual $actualDropped vs expected $expectedDropped")
    dupPairs.foreach { case (a, b) =>
      assert(!(kept.contains(a) && kept.contains(b)),
        s"duplicate pair ($a,$b) survived intact")
    }
    // kept rows carry their true cell assignment
    kept.foreach { case (id, cell) => assert(cellOf(id) == cell) }
  }

  test("adaptive nlist: cells grow with the corpus; assignment stays the argmax") {
    // formula boundaries (floor at 8, linear at 250/cell, UNCAPPED —
    // past LiteralCentroidMax the broadcast-join face takes over)
    assert(Similarity.adaptiveNlist(0) == 8)
    assert(Similarity.adaptiveNlist(2000) == 8)
    assert(Similarity.adaptiveNlist(2249) == 8)
    assert(Similarity.adaptiveNlist(2250) == 9)
    assert(Similarity.adaptiveNlist(20000) == 80)
    assert(Similarity.adaptiveNlist(1L << 40) == (1L << 40) / 250)
    assert(Similarity.adaptiveNlist(1L << 40) > Similarity.LiteralCentroidMax)

    // a 3000-row corpus must get 12 cells, and every row's cell must be
    // the argmax over exactly those 12 seeded centroids (strict-improve
    // fold = lowest cent_id on ties, the oracle's ORDER BY)
    import spark.implicits._
    val n = 3000
    val rows = (0 until n).map { i =>
      val r = new java.util.SplittableRandom(i * 0x9E3779B97F4A7C15L + 7)
      (i.toLong, Array.fill(16)(r.nextDouble(-1.0, 1.0).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val assigned = Similarity.seededAssignedOf(emb)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned.values.max == 11 && assigned.values.min == 0,
      s"3000 rows must spread over cells 0..11, got ${assigned.values.toSet}")

    val cents = rows.take(12).map { case (_, v) =>
      val arr = v.map(_.toDouble).toArray
      (arr, math.sqrt(arr.map(x => x * x).sum))
    }
    rows.foreach { case (id, v) =>
      val x = v.map(_.toDouble).toArray
      val nrm = math.sqrt(x.map(a => a * a).sum)
      val best = cents.zipWithIndex.minBy { case ((c, cn), i) =>
        (-x.zip(c).map(p => p._1 * p._2).sum / (nrm * cn), i)
      }._2
      assert(assigned(id) == best.toLong,
        s"vec $id assigned cell ${assigned(id)}, argmax is $best")
    }
  }
}
