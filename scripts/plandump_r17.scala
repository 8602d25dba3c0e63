// Round-17 plan dump: evidence for the session-2 additions — run
// through a plain spark-shell holding only the packaged jar
// (docs/PLANS_r17.md).
object PlanDumpR17 {
  def show(tag: String, df: org.apache.spark.sql.DataFrame, run: Boolean = true): Unit = {
    if (run) df.write.format("noop").mode("overwrite").save()
    println(s"\n##PLAN## $tag")
    println(df.queryExecution.executedPlan.toString.take(6000))
  }
  def run(): Unit = {
    val s = spark
    val real = "/root/testdata/sf0.1"
    val x30 = "/tmp/graft_scale/x30"
    if (!new java.io.File(s"$x30/customer.parquet").exists())
      graft.ScaleCorpus.generate(s, real, x30, 30)

    // 1. decontaminate_embedding: benchmark side is ONE BroadcastExchange;
    // the corpus reads through a narrow scan + the fused cosine filter —
    // no corpus shuffle before the τ cut (only the presentation sort).
    show("decontaminate_embedding_broadcast_bench",
      graft.SparkEntry.queries("decontaminate_embedding")(s, real))

    // 2. ann_mips_topk: queries broadcast; the partial top-k aggregation
    // (ObjectHashAggregate over the bounded TopKAggregator) ships <= k
    // rows per (map partition, query) — no corpus-wide window funnel.
    show("ann_mips_topk_broadcast_partial_topk",
      graft.SparkEntry.queries("ann_mips_topk")(s, real))

    // 3. mix_doremi: the corpus reduces through map-side-combined
    // groupBy(source) passes (partial HashAggregates before every
    // exchange); the unpartitioned windows run over #sources rows.
    show("mix_doremi_mapside_combine",
      graft.SparkEntry.queries("mix_doremi")(s, real))

    // 4. the seeded quantizer PAST LiteralCentroidMax (x30: 1.8M
    // vectors, nlist ~ 7.3k): assignment is BroadcastNestedLoopJoin
    // against the ONE packed centroid row — the corpus never shuffles
    // for assignment; below the ceiling (sf0.1) there is no join at all.
    show("dedup_semantic_x30_broadcast_quantizer",
      graft.SparkEntry.queries("dedup_semantic")(s, x30), run = false)
    show("dedup_semantic_sf01_literal_quantizer",
      graft.SparkEntry.queries("dedup_semantic")(s, real), run = false)
  }
}
PlanDumpR17.run()
System.exit(0)
