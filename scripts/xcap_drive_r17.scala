// Round-17 past-cap quantizer drive (docs/PLANS_r17.md): 520x the
// sf0.1 embeddings (1.04M vectors -> adaptiveNlist 4160 >
// LiteralCentroidMax 4096), so seededAssignedOf plans the
// BROADCAST-JOIN face; dedup_semantic runs end-to-end on it. Records
// the plan marker (the packed cents_arr broadcast row) and two walls
// (run 2 = steady state, the sweep's min-of-2 discipline).
object XCapDrive {
  def run(): Unit = {
    val s = spark
    val real = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_scale/xcap"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val fit = graft.ScaleCorpus.fitEmbeddings(s, real)
      graft.ScaleCorpus.generateEmbeddings(s, fit, 520, 2016L,
        s"$dir/embeddings.parquet")
    }
    val q = graft.SparkEntry.queries("dedup_semantic")(s, dir)
    val plan = q.queryExecution.optimizedPlan.toString
    println(s"##XCAP## vectors=${graft.Tables.embeddings(s, dir).count()} " +
      s"bcastFace=${plan.contains("cents_arr")}")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime
      val n = q.count()
      println(s"##XCAP## run$i rows=$n wall=${(System.nanoTime - t0) / 1e9}")
    }
  }
}
XCapDrive.run()
System.exit(0)
