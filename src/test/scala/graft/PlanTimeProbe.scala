package graft
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val out = new java.io.PrintWriter("/tmp/plantime.txt")
    for (q <- args.drop(1)) {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analyze+optimize+plan (pre-AQE-exec)
        val t2 = System.nanoTime()
        val t3 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t4 = System.nanoTime()
        out.println(f"$q rep$rep construct=${(t1-t0)/1e9}%.2f plan=${(t2-t1)/1e9}%.2f exec=${(t4-t3)/1e9}%.2f")
        out.flush()
      }
    }
    out.close(); spark.stop()
  }
}
