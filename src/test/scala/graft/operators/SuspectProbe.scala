package graft.operators

/** One-off (r18): solo rerun of the two gate wall-suspects —
  * dedup_clusters_star and dedup_containment (heaps corpus) — at their
  * sweep scale points, min-of-2, quiet host. */
object SuspectProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(q: String, dir: String): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    for ((q, lo, hi) <- Seq(
        ("dedup_clusters_star", "/tmp/graft_scale/x1", "/tmp/graft_scale/x10"),
        ("dedup_containment", "/tmp/graft_scale/hx1", "/tmp/graft_scale/hx10"))) {
      val w1 = time(q, lo); val w10 = time(q, hi)
      println(f"##SUS## $q x1=$w1%.2f x10=$w10%.2f ratio=${w10 / w1}%.2f")
    }
    spark.stop()
  }
}
