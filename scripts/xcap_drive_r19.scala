// Round-19 rerun of the past-cap quantizer drive: same 520x corpus
// (1.04M vectors, nlist 4160, broadcast quantizer face), same
// dedup_semantic end-to-end, same two-wall discipline. r18 measured
// 66.8 s (fresh) / 20.1 s (warm checkpoint). r19 A/B at this scale
// (sed-swap of FetchBroadcastMaxRows 1M <-> 2M, same host, same JVM
// config, back to back): shuffle-hash verify-fetch face 79.7 fresh /
// 40.1 warm; broadcast face 51.7 fresh / 5.8 warm — rows identical
// (336,841) at every point. The 2M threshold ships on this evidence.
object XCapDrive19 {
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
      val c = q.count()
      println(s"##XCAP## run$i rows=$c wall=${(System.nanoTime - t0) / 1e9}")
    }
  }
}
XCapDrive19.run()
System.exit(0)
