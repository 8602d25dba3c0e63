// Dump `explain formatted` trees for the round-11 queries through the
// PACKAGED jar (same consumption-layer posture as docs/PLANS_r10.md).
// Run: spark-shell --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//        --conf spark.sql.legacy.parquet.nanosAsLong=true \
//        --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//        -I scripts/plandump_r11.scala
object PlanDumpR11 {
  def run(spark: org.apache.spark.sql.SparkSession): Unit = {
    val names = Seq("text_readability", "search_rrf_fusion", "search_hybrid_rrf",
      "tokenize_vocab_units", "mix_quality_by_source", "sample_weighted",
      "corpus_diff", "profile_ngram_novelty", "profile_equidepth_price",
      "match_entities")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val lines = p.linesIterator.toSeq
      val head = lines.takeWhile(l => !l.startsWith("(1)")).take(70)
      sb ++= s"\n## $n\n\n```\n" + (head :+ "...").mkString("\n") + "\n```\n"
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/plans_r11.md"), sb.toString)
    println("PLANDUMP done")
  }
}
PlanDumpR11.run(spark)
System.exit(0)
