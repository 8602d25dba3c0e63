package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over relationship edges mined from the
 * relational tables — PageRank here, complementing the label-propagation
 * connected components in [[ConnectedComponents]]. The demo graph is the
 * customer↔supplier transaction graph (an edge per distinct
 * customer-supplier pair lineitem⋈orders witnessed), the bipartite
 * structure every marketplace / interaction dataset produces.
 *
 * INTEGER PageRank (the repo-wide determinism stance): scores live in
 * 2^20 fixed point; each iteration is contrib = score div out_degree
 * (exact truncating division, identical both engines), an exact BIGINT
 * sum over in-edges, and new = (15·2^20) div 100 + (85·Σ) div 100 —
 * no float ever enters the loop, so partition/merge order cannot move a
 * single bit and the DuckDB twin (the same three iterations as chained
 * CTEs) matches exactly. Overflow headroom: Σ contrib < n_nodes·2^20;
 * ×85 stays under 2^63 past 10^14 nodes.
 *
 * Shape at 100 TB: the canonical Pregel-lite plan — the edge list (with
 * out-degree pre-joined) persists ONCE partitioned by src; each of the
 * fixed iterations is one hash join (scores are node-sized, not
 * edge-sized; AQE broadcasts them while they fit) plus one
 * map-side-combined groupBy(dst). Iteration count is fixed (rank
 * quality, not convergence detection — no driver round-trips).
 */
object Graph {

  private val Scale = 1048576L // 2^20, the house fixed-point
  private val Iters = 3
  private val TopN = 30

  /** Damped integer PageRank over `edges` (src, dst, deg pre-joined). */
  private[operators] def pageRankFp(edgesWithDeg: DataFrame, iters: Int): DataFrame = {
    var score = edgesWithDeg.select(col("src").as("node")).distinct()
      .withColumn("fx", lit(Scale))
    for (_ <- 1 to iters) {
      score = edgesWithDeg
        .join(score.withColumnRenamed("node", "src"), "src")
        .withColumn("contrib", expr("fx div deg"))
        .groupBy(col("dst").as("node"))
        .agg(sum("contrib").as("csum"))
        .select(col("node"),
          expr(s"(15 * ${Scale}L) div 100 + (85 * csum) div 100").as("fx"))
    }
    score
  }

  /** Top-[[TopN]] nodes of the customer↔supplier graph by 3-iteration
    * PageRank. Node ids pack type into the low bit (cust = 2k,
    * supp = 2k+1) so one BIGINT column carries the bipartite namespace. */
  private val graphPagerank = QueryDef(
    (s, dir) => {
      // r20 opt: pairs is consumed by BOTH union arms (and through them
      // by deg and the join) — the stage census showed the whole
      // lineitem⋈orders+distinct subtree executing twice (two identical
      // 5.5 MB map stages + two 11 MB reduces). A LAZY checkpoint
      // materializes it once when ewd's eager checkpoint below runs;
      // every later consumer reads the cached rows.
      val pairs = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("cust_node"),
          (col("l_suppkey") * 2 + 1).as("supp_node"))
        .distinct()
        .localCheckpoint(false)
      val edges = pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
        .union(pairs.select(col("supp_node").as("src"), col("cust_node").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // eager materialization: every iteration re-reads the edge list,
      // so cut its lineage ONCE (localCheckpoint = the curateIngest
      // precedent — no unpersist bookkeeping, freed with the session).
      // r20 opt: checkpoint the list ALREADY hash-partitioned by src —
      // the shape the class doc promises ("persists ONCE partitioned by
      // src") — so each iteration's edges⋈scores join consumes the
      // checkpoint's partitioning instead of re-exchanging the edge
      // list (the census showed that exchange written twice and read
      // three times: 2 × 13.9 MB writes gone).
      val ewd = edges.join(deg, "src").repartition(col("src")).localCheckpoint()
      pageRankFp(ewd, Iters)
        .orderBy(col("fx").desc, col("node"))
        .limit(TopN)
        .select(col("node").as("node_id"), col("fx").as("score_fx"),
          (col("fx").cast("double") / Scale.toDouble).as("score"))
    },
    Some {
      def iter(prev: String, cur: String) =
        s"""$cur AS (
        |  SELECT dst AS node,
        |         (15 * $Scale) // 100 + (85 * SUM(fx // deg)) // 100 AS fx
        |  FROM pedges JOIN pdeg USING (src) JOIN $prev ON $prev.node = pedges.src
        |  GROUP BY dst)""".stripMargin
      s"""WITH pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS cust_node, l_suppkey * 2 + 1 AS supp_node
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
      |pedges AS (
      |  SELECT cust_node AS src, supp_node AS dst FROM pairs
      |  UNION ALL
      |  SELECT supp_node AS src, cust_node AS dst FROM pairs),
      |pdeg AS (
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM pedges GROUP BY 1),
      |s0 AS (
      |  SELECT src AS node, CAST($Scale AS BIGINT) AS fx FROM pdeg),
      |${iter("s0", "s1")},
      |${iter("s1", "s2")},
      |${iter("s2", "s3")}
      |SELECT node AS node_id, CAST(fx AS BIGINT) AS score_fx,
      |  CAST(fx AS DOUBLE) / $Scale AS score
      |FROM s3 ORDER BY score_fx DESC, node_id LIMIT $TopN""".stripMargin
    })

  val all: Map[String, QueryDef] = Map(
    "graph_pagerank" -> graphPagerank)
}
