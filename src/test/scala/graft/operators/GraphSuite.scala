package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Pins for integer PageRank: exact agreement with a hand-rolled driver
  * implementation on both a synthetic graph and the full fixture-mined
  * customer↔supplier graph (engine-independent; DuckDB is the third
  * voice). */
class GraphSuite extends SparkSuite {

  private val Scale = 1048576L

  /** Driver-side mirror of the integer PageRank recurrence. */
  private def prScala(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var score: Map[Long, Long] = deg.keys.map(_ -> Scale).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2)
      score = in.map { case (dst, es) =>
        val s = es.map { case (src, _) => score(src) / deg(src) }.sum
        dst -> (15 * Scale / 100 + 85 * s / 100)
      }
    }
    score
  }

  test("pageRankFp matches the driver mirror on a 4-node undirected path") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = und ++ und.map(_.swap)
    val e = edges.toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val got = Graph.pageRankFp(e.join(deg, "src"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === prScala(edges, 3))
    // ends of the path funnel through the middle: interior nodes rank higher
    assert(got(2L) > got(1L) && got(3L) > got(4L))
  }

  test("graph_pagerank equals the driver mirror over the fixture graph") {
    val pairs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.toSeq ++ pairs.map(_.swap)
    val expected = prScala(edges, 3).toSeq
      .sortBy { case (n, fx) => (-fx, n) }.take(30)
      .map { case (n, fx) => (n, fx) }

    val got = SparkEntry.queries("graph_pagerank")(spark, sfDir)
      .select("node_id", "score_fx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }
}
