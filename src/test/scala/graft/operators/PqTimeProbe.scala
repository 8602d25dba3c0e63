package graft.operators

/** One-off: time ann_pq_topk with and without whole-stage codegen. */
object PqTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(tag: String): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("ann_pq_topk")(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
        println(s"##T## $tag run$i ${(System.nanoTime() - t0) / 1e9}")
      }
    }
    run("wsc_on")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    run("wsc_off")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    run("exprs_interpreted")
    spark.stop()
  }
}
