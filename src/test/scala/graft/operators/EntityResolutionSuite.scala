package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeExec}

/** Pins for blocked entity resolution: (1) the blocked candidate
  * generation plus threshold-bounded levenshtein finds EXACTLY the
  * matches an exhaustive all-pairs sweep finds (a blind spot in the
  * blocking key would be invisible to the DuckDB twin, which shares
  * it); (2) the pair stage keeps its parallelism FLOOR — the r10 plan
  * let AQE coalesce the block exchange to 5 tasks by byte size while
  * the cost was CPU (≈740k levenshtein pairs on one core each). */
class EntityResolutionSuite extends SparkSuite {

  test("blocked match equals exhaustive all-pairs at dist <= 1") {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // exhaustive sweep under the SAME block key the query (and its
    // DuckDB twin) uses — blocking is the operator's declared
    // approximation (the LSH-band stance), so the engine-independent
    // reference is "all pairs within a block", not the unblocked sweep
    val blocked = (for {
      (i, a) <- cust; (j, b) <- cust
      if i < j && a.take(16) == b.take(16) && lev(a, b) <= 1
    } yield (i, j, lev(a, b))).sortBy(p => (p._1, p._2)).toSeq
    assert(blocked.nonEmpty, "fixture produced no in-block matches")

    val got = SparkEntry.queries("match_entities")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === blocked)
  }

  test("pair stage parallelism floor: block exchange is pinned, not AQE-coalesced") {
    val df = SparkEntry.queries("match_entities")(spark, sfDir)
    df.collect()
    val want = EntityResolution.pairParallelism(spark)
    val pinned = flattenPlan(df.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec
          if s.shuffleOrigin == REPARTITION_BY_NUM &&
            s.outputPartitioning.numPartitions == want => s
    }
    assert(pinned.nonEmpty,
      s"no REPARTITION_BY_NUM exchange at $want partitions:\n" +
        df.queryExecution.executedPlan.toString.take(4000))
  }
}
