// Round-16 plan dump: the scale-fix evidence — run through a plain
// spark-shell holding only the packaged jar (docs/PLANS_r16.md).
object PlanDumpR16 {
  def show(tag: String, df: org.apache.spark.sql.DataFrame, run: Boolean = true): Unit = {
    if (run) df.write.format("noop").mode("overwrite").save()
    println(s"\n##PLAN## $tag")
    println(df.queryExecution.executedPlan.toString.take(6000))
  }
  def run(): Unit = {
    val s = spark
    val x10 = "/tmp/graft_scale/x10"
    val real = "/root/testdata/sf0.1"
    if (!new java.io.File(s"$x10/customer.parquet").exists())
      graft.ScaleCorpus.generate(s, real, x10, 10)

    // 1. adaptive nlist: at the 10x corpus the seeded quantizer plans
    // 80 cells (20000/250) — the centroid literal array in the fold is
    // 80 entries; at sf0.1 it stays 8. The pair exchange below is
    // REPARTITION_BY_NUM (SkewGuard's explicit pair parallelism) — the
    // shuffle origin AQE never coalesces.
    show("knn_graph_x10_adaptive_cells",
      graft.SparkEntry.queries("knn_graph")(s, x10))

    // 2. the banded cosine pair family at 10x: same REPARTITION_BY_NUM
    // pair exchange; SkewGuard's hot/cold split visible.
    show("dedup_embedding_cosine_x10_pair_parallelism",
      graft.SparkEntry.queries("dedup_embedding_cosine")(s, x10))

    // 3. containment with the PPJoin positional filter: the candidate
    // join's condition carries the 5*(1+least(...)) >= 4*least(...)
    // bound and the n_b >= n_a smaller-side cut.
    show("dedup_containment_positional_filter",
      graft.SparkEntry.queries("dedup_containment")(s, "/root/testdata/sf0.001"))

    // 4. marker-first read faces: the latest-table scan lists ONLY the
    // pinned epoch's directory (basePath-scoped — the file index shows
    // one epoch path), two epochs on disk.
    val path = java.nio.file.Files.createTempDirectory("plandump-r16").toString
    graft.operators.KnnGraphStore.build(s, "/root/testdata/sf0.001", path)
    graft.operators.KnnGraphStore.refresh(s, "/root/testdata/sf0.001", path)
    show("knn_store_edges_marker_first_two_epochs",
      graft.operators.KnnGraphStore.edges(s, path))
    show("knn_store_probe_marker_first",
      graft.operators.KnnGraphStore.neighbors(s, path, Seq(3L)))
  }
}
PlanDumpR16.run()
System.exit(0)
