package graft.metrics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The job-group-labeled task-metrics aggregation behind the per-round
  * `resources` METRICS section: a shuffling query must register shuffle
  * bytes under its label, a narrow query must register none, and labels
  * must not bleed into each other. */
class TaskMetricsProbeSuite extends SparkSuite {

  test("probe attributes shuffle bytes to the labeled group, none to narrow runs") {
    val probe = new TaskMetricsProbe
    spark.sparkContext.addSparkListener(probe)
    try {
      spark.sparkContext.setJobGroup("probe_shuffle", "suite", false)
      try Tables.lineitem(spark, sfDir)
        .repartition(4, col("l_orderkey")) // an unconditional exchange
        .groupBy("l_returnflag").agg(sum("l_quantity"))
        .write.format("noop").mode("overwrite").save()
      finally spark.sparkContext.clearJobGroup()

      spark.sparkContext.setJobGroup("probe_narrow", "suite", false)
      try Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey") + 1)
        .write.format("noop").mode("overwrite").save()
      finally spark.sparkContext.clearJobGroup()

      // exercise the reflective bus-drain path (exact), not just the
      // settle-polling fallback — and prove reflection resolves on this
      // Spark build rather than silently degrading to the heuristic
      assert(probe.busDrained(spark.sparkContext, 10000),
        "reflective listenerBus.waitUntilEmpty did not engage")
      probe.quiesce(sc = spark.sparkContext)
      val sh = probe.snapshot("probe_shuffle")
      assert(sh.isDefined)
      assert(sh.get.shuffleWriteBytes > 0, s"tasks=${sh.get.tasks}")
      assert(sh.get.tasks > 0 && sh.get.inputBytes > 0)
      val nr = probe.snapshot("probe_narrow")
      assert(nr.isDefined)
      assert(nr.get.shuffleWriteBytes == 0 && nr.get.shuffleReadBytes == 0,
        s"narrow run shuffled: ${nr.get.shuffleWriteBytes}")

      // an unlabeled action lands nowhere
      Tables.region(spark, sfDir).count()
      probe.quiesce()
      assert(probe.snapshot("probe_narrow").get.tasks == nr.get.tasks)
    } finally spark.sparkContext.removeSparkListener(probe)
  }
}
