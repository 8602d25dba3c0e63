package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Pins the r20 scale-adaptive spread policy (Tables.spread):
  *  - small/single-file inputs (the fixtures) repartition to
  *    2 × defaultParallelism — the parallelizing exchange the corpus
  *    operators have relied on since r7, now core-derived;
  *  - inputs whose scan is already parallel (estimated tasks ≥ 2×cores)
  *    take NO exchange at all — at 100 TB the round-robin repartition
  *    vanishes instead of capping the plan at a local-mode constant.
  * The second face is driven by shrinking maxPartitionBytes so the SAME
  * fixture file estimates to many scan tasks — the estimator reads the
  * session conf, so this exercises the exact production decision. */
class SpreadSuite extends SparkSuite {

  private def roundRobins(df: org.apache.spark.sql.DataFrame) =
    flattenPlan(df.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec
          if s.outputPartitioning.toString.contains("RoundRobin") => s
    }

  test("small input spreads to 2 x defaultParallelism") {
    val df = Tables.documentsSpread(spark, sfDir)
    val rr = roundRobins(df)
    assert(rr.nonEmpty, df.queryExecution.executedPlan.toString.take(2000))
    assert(rr.head.outputPartitioning.numPartitions ==
      2 * spark.sparkContext.defaultParallelism)
  }

  test("already-parallel input takes no exchange") {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1k") // 64 KB fixture file -> ~64 estimated tasks
      val df = Tables.documentsSpread(spark, sfDir)
      assert(roundRobins(df).isEmpty,
        df.queryExecution.executedPlan.toString.take(2000))
      // results identical on either face
      assert(df.count() == Tables.documents(spark, sfDir).count())
    } finally spark.conf.set(key, prev)
  }

  test("spreadFrame leaves wide frames alone and spreads narrow ones") {
    val narrow = Tables.documents(spark, sfDir) // single file -> 1 partition
    assert(Tables.spreadFrame(narrow).rdd.getNumPartitions ==
      2 * spark.sparkContext.defaultParallelism)
    val wide = narrow.repartition(4 * spark.sparkContext.defaultParallelism)
    assert(Tables.spreadFrame(wide) eq wide)
  }
}
