package graft.operators

import graft.metrics.TaskMetricsProbe

/** One-off (r18, generalized r19): solo rerun of gate-flagged
  * query@scale points — min-of-2 walls PLUS the resource snapshot of
  * the min-wall run (peak task memory corroborates or clears a
  * peak-mem flag the same way a quiet wall clears a wall flag).
  * Args: q lo hi [q lo hi ...]; defaults to the r18 suspects. */
object SuspectProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = new TaskMetricsProbe
    spark.sparkContext.addSparkListener(probe)
    def run(q: String, dir: String, label: String): (Double, Long) = {
      graft.ScaleReport.settle(spark)
      spark.sparkContext.setJobGroup(label, label, interruptOnCancel = false)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.sparkContext.clearJobGroup()
      val wall = (System.nanoTime() - t0) / 1e9
      probe.quiesce(sc = spark.sparkContext)
      (wall, probe.snapshot(label).map(_.peakTaskMemory).getOrElse(-1L))
    }
    def best(q: String, dir: String, tag: String): (Double, Long) =
      (1 to 2).map(i => run(q, dir, s"$q@$tag#$i")).minBy(_._1)
    val triples =
      if (args.nonEmpty) args.grouped(3).map(a => (a(0), a(1), a(2))).toSeq
      else Seq(
        ("dedup_clusters_star", "/tmp/graft_scale/x1", "/tmp/graft_scale/x10"),
        ("dedup_containment", "/tmp/graft_scale/hx1", "/tmp/graft_scale/hx10"))
    for ((q, lo, hi) <- triples) {
      val (w1, p1) = best(q, lo, "lo")
      val (w10, p10) = best(q, hi, "hi")
      println(f"##SUS## $q lo=$w1%.2f hi=$w10%.2f ratio=${w10 / w1}%.2f " +
        f"peak_lo=${p1 / 1e6}%.1fMB peak_hi=${p10 / 1e6}%.1fMB " +
        f"peak_ratio=${p10.toDouble / math.max(1L, p1)}%.2f")
    }
    spark.stop()
  }
}
