// Round-15 plan dump: run through a plain spark-shell holding only the
// packaged library jar (see docs/PLANS_r15.md for the reading guide).
object PlanDumpR15 {
  def show(tag: String, df: org.apache.spark.sql.DataFrame, run: Boolean = true): Unit = {
    if (run) df.write.format("noop").mode("overwrite").save()
    println(s"\n##PLAN## $tag")
    println(df.queryExecution.executedPlan.toString.take(5000))
  }
  def run(): Unit = {
    val dir = "/root/testdata/sf0.001"
    val s = spark
    // refresh lifecycle: two committed epochs on disk, probe prunes to
    // ONE (epoch, bucket) partition of the LATEST epoch
    val path = java.nio.file.Files.createTempDirectory("plandump-knnr").toString
    graft.operators.KnnGraphStore.build(s, dir, path)
    graft.operators.KnnGraphStore.refresh(s, dir, path)
    show("knn_store_probe_2_epochs",
      graft.operators.KnnGraphStore.neighbors(s, path, Seq(3L)))
    // after expiry: same probe over the single surviving epoch
    graft.operators.KnnGraphStore.expire(s, path)
    show("knn_store_probe_post_expire",
      graft.operators.KnnGraphStore.neighbors(s, path, Seq(3L)))
    // the latest-epoch read itself: epoch filter is a partition filter
    show("knn_store_edges_latest",
      graft.operators.KnnGraphStore.edges(s, path))
    // store procedures: LocalScan rows, no data tasks
    val cat = java.nio.file.Files.createTempDirectory("plandump-cat15").toString
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftLogCatalog")
    s.conf.set("spark.sql.catalog.graft.root", cat)
    show("store_stats_localscan",
      s.sql(s"CALL graft.system.store_stats(path => '$path')"))
    show("expire_epochs_localscan",
      s.sql(s"CALL graft.system.expire_epochs(path => '$path/edges')"))
  }
}
PlanDumpR15.run()
System.exit(0)
