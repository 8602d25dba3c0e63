package graft.operators

/** One-off measurement main (r18, re-pointed r19): raw vs distinct
  * candidate mass of the embedding-cosine band join at a given corpus
  * dir, now through the REAL [[Similarity.bandCandidates]] path (the
  * adaptive band ladder picks the rung from the corpus count), plus the
  * verified output size — the three numbers the "candidates are
  * output-bound" claim is judged on. */
object CandMassProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x10")
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = Similarity.embeddingsCountFor(spark, dir)
    val (r, b) = Similarity.adaptiveBandParams(n)
    val t0 = System.nanoTime()
    val pairs = Similarity.bandCandidates(spark, dir)
    val raw = pairs.count()
    val tRaw = (System.nanoTime() - t0) / 1e9
    graft.ScaleReport.settle(spark) // shuffle files of the finished job
    val dist = pairs.distinct().count()
    graft.ScaleReport.settle(spark)
    val verified = Similarity.embeddingCosinePairs(spark, dir).count()
    println(f"##CAND## n=$n rung=${r}x$b raw=$raw distinct=$dist " +
      f"verified=$verified ratio=${raw.toDouble / dist}%.2f " +
      f"cand_per_output=${raw.toDouble / math.max(1L, verified)}%.1f " +
      f"raw_wall=$tRaw%.1f")
    spark.stop()
  }
}
