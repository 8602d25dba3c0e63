package graft.operators

/** One-off: dump ann_pq_topk's executed plan (r18 fusion diagnosis). */
object PqPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("ann_pq_topk")(spark, "/root/testdata/sf0.01")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/pq_plan.txt"), df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
