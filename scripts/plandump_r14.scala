// Round-14 plan dump: run through a plain spark-shell holding only the
// packaged library jar (see docs/PLANS_r14.md for the reading guide).
object PlanDumpR14 {
  def show(tag: String, df: org.apache.spark.sql.DataFrame, run: Boolean = true): Unit = {
    if (run) df.write.format("noop").mode("overwrite").save()
    println(s"\n##PLAN## $tag")
    println(df.queryExecution.executedPlan.toString.take(5000))
  }
  def run(): Unit = {
    val dir = "/root/testdata/sf0.001"
    val s = spark
    // persisted kNN store probe: bucket-pruned point read
    val path = java.nio.file.Files.createTempDirectory("plandump-knn").toString
    graft.operators.KnnGraphStore.build(s, dir, path)
    show("knn_store_point_probe", graft.operators.KnnGraphStore.neighbors(s, path, Seq(3L)))
    // graph_triangles consuming the store (edge joins only)
    show("graph_triangles_probe", graft.SparkEntry.queries("graph_triangles")(s, dir))
    // SQL catalog: pushed partition+offset bounds through a table name
    val root = java.nio.file.Files.createTempDirectory("plandump-cat").toString
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftLogCatalog")
    s.conf.set("spark.sql.catalog.graft.root", root)
    s.sql("CREATE TABLE graft.l")
    s.sql("INSERT INTO graft.l SELECT cast(id % 4 as int), id div 4, cast(id as string), concat('v', id) FROM range(80)")
    show("catalog_pushdown_select",
      s.sql("SELECT key FROM graft.l WHERE partition = 2 AND offset >= 10"))
    show("catalog_count_footer_stats", s.sql("SELECT count(*) FROM graft.l"))
    // fused redaction chain inside whole-stage codegen
    show("text_pii_redact_fused", graft.SparkEntry.queries("text_pii_redact")(s, dir))
  }
}
PlanDumpR14.run()
System.exit(0)
