// Round-20 past-cap drive: the int8 bound-prefilter on the shuffle-hash
// verify-fetch face, measured at the same 520x corpus as the r18/r19
// drives (1.04M vectors, nlist 4160, broadcast quantizer face).
// dedup_semantic runs end-to-end with the verify-fetch face FORCED to
// shuffle-hash (the past-FetchBroadcastMaxBytes regime) twice per arm:
// screen=off (the r19 shuffle face verbatim) vs screen=on (int8 codes
// fetched first, only upper-bound survivors fetch raw floats). Rows
// must be identical (the screen is lossless); the shuffle bytes and the
// warm wall are the measurement. Results recorded in docs/PLANS_r20.md.
object XCapDrive20 {
  def run(): Unit = {
    val s = spark
    val real = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_scale/xcap"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val fit = graft.ScaleCorpus.fitEmbeddings(s, real)
      graft.ScaleCorpus.generateEmbeddings(s, fit, 520, 2016L,
        s"$dir/embeddings.parquet")
    }
    val probe = new graft.metrics.TaskMetricsProbe
    s.sparkContext.addSparkListener(probe)
    sys.props("graft.verifyFetchFace") = "shuffle"
    def one(screen: String, i: Int): Unit = {
      sys.props("graft.int8Screen") = screen
      graft.ScaleReport.settle(s)
      val label = s"xcap20/$screen#$i"
      s.sparkContext.setJobGroup(label, label, false)
      val t0 = System.nanoTime
      val c = graft.SparkEntry.queries("dedup_semantic")(s, dir).count()
      s.sparkContext.clearJobGroup()
      val w = (System.nanoTime - t0) / 1e9
      probe.quiesce(sc = s.sparkContext)
      val st = probe.snapshot(label).get
      println(f"##XCAP20## screen=$screen run=$i rows=$c wall=$w%.1f " +
        f"shufW=${st.shuffleWriteBytes / 1e9}%.2fGB shufR=${st.shuffleReadBytes / 1e9}%.2fGB " +
        f"peak=${st.peakTaskMemory / 1e6}%.1fMB spillD=${st.diskSpillBytes / 1e9}%.2fGB")
    }
    for (screen <- Seq("off", "on"); i <- 1 to 2) one(screen, i)
    sys.props.remove("graft.verifyFetchFace")
    sys.props.remove("graft.int8Screen")
  }
}
XCapDrive20.run()
System.exit(0)
