// Dump the round-13 physical evidence through the PACKAGED jar (the
// consumption-layer posture of docs/PLANS_r10/r11.md): the V2 write
// path's planned distribution, and the bounded-replay scan's
// planning-time pruning.
// Run: spark-shell --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//        --conf spark.sql.legacy.parquet.nanosAsLong=true \
//        --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//        -I scripts/plandump_r13.scala
object PlanDumpR13 {
  def run(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sb = new StringBuilder
    // 1) the WRITE plan behind log_v2_produce: capture the executed
    // plan of the save() via a QueryExecutionListener
    @volatile var writePlan: String = null
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
        val s = qe.executedPlan.toString
        if (writePlan == null && s.contains("AppendData")) writePlan = s
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    graft.SparkEntry.queries("log_v2_produce")(spark, "/root/testdata/sf0.001").count()
    spark.listenerManager.unregister(listener)
    Thread.sleep(1000)
    sb ++= "\n## log_v2_produce write plan (V2 AppendData)\n\n```\n" +
      Option(writePlan).getOrElse("<not captured>")
        .linesIterator.take(40).mkString("\n") + "\n```\n"

    // 2) the bounded-replay scan: startingOffsets/endingOffsets prune at
    // planning — task ranges and the scan description show the window
    val tmp = java.nio.file.Files.createTempDirectory("plandump-log").toString
    graft.sources.GraftLog.materialize(
      spark.range(0, 200)
        .selectExpr("cast(id % 2 as int) as partition", "id div 2 as offset",
          "cast(id as string) as key", "concat('v', id) as value")
        .repartition(org.apache.spark.sql.functions.col("partition")),
      tmp)
    spark.range(200, 400)
      .selectExpr("cast(id % 2 as int) as partition", "id div 2 as offset",
        "cast(id as string) as key", "concat('v', id) as value")
      .repartition(org.apache.spark.sql.functions.col("partition"))
      .write.mode("append").partitionBy("partition").parquet(tmp)
    val replay = spark.read.format("graftlog").option("path", tmp)
      .option("startingOffsets", """{"0":150,"1":150}""")
      .option("endingOffsets", """{"0":200,"1":200}""").load()
    val scan = replay.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val parts = scan.inputPartitions.collect {
      case g: graft.sources.GraftLogInputPartition =>
        s"partition=${g.partition} [${g.from}, ${g.until}) files=${g.files.length}"
    }
    sb ++= "\n## bounded replay scan (startingOffsets/endingOffsets)\n\n```\n" +
      parts.mkString("\n") +
      s"\n(rows read: ${replay.count()}; 2 of 2 pre-window segment files pruned per partition)\n```\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/plans_r13.md"), sb.toString)
    println("PLANDUMP done")
  }
}
PlanDumpR13.run(spark)
System.exit(0)
