// Dump `explain formatted` trees for the round-10 queries through the
// PACKAGED jar (same consumption-layer posture as docs/PLANS_r9.md).
// Run: spark-shell --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//        --conf spark.sql.legacy.parquet.nanosAsLong=true \
//        --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//        -I scripts/plandump_r10.scala
object PlanDumpR10 {
  def run(spark: org.apache.spark.sql.SparkSession): Unit = {
    val names = Seq("search_tfidf_cosine", "ann_range_search", "export_jsonl",
      "tokenize_bpe_encode", "index_postings_incremental", "search_bm25_indexed")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val lines = p.linesIterator.toSeq
      val head = lines.takeWhile(l => !l.startsWith("(1)")).take(60)
      sb ++= s"\n## $n\n\n```\n" + (head :+ "...").mkString("\n") + "\n```\n"
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/plans_r10.md"), sb.toString)
    println("PLANDUMP done")
  }
}
PlanDumpR10.run(spark)
System.exit(0)
