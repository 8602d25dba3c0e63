// Round-18 rerun of the past-cap quantizer drive (docs/PLANS_r17.md §4)
// with the NATIVE nearest_centroid kernel: same 520x corpus (1.04M
// vectors, adaptiveNlist 4160 > LiteralCentroidMax 4096 -> broadcast
// face), same dedup_semantic end-to-end, same two-wall discipline. The
// r17 measured ceiling was assignment COMPUTE: 4,422.6 s (run 1) vs
// ~600 s linear-from-x30; the kernel keeps the N x nlist work count
// and removes the interpreted-HOF constant.
object XCapDrive18 {
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
    // the query's own optimized plan hides the assignment behind the
    // localCheckpoint RDD boundary — probe the face/kernel markers on
    // the assignment subplan (what the checkpoint materializes)
    val emb = graft.Tables.embeddings(s, dir).repartition(64)
    val n = emb.count()
    val assignedPlan = graft.operators.Similarity
      .quantizerAssignment(emb, Some(n))
      .queryExecution.optimizedPlan.toString
    println(s"##XCAP## vectors=$n " +
      s"bcastFace=${assignedPlan.contains("cents_arr")} " +
      s"nativeKernel=${assignedPlan.contains("nearest_centroid")}")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime
      val n = q.count()
      println(s"##XCAP## run$i rows=$n wall=${(System.nanoTime - t0) / 1e9}")
    }
  }
}
XCapDrive18.run()
System.exit(0)
