package graft.operators

import org.apache.spark.sql.functions._

/** r18 two-level quantizer drive: generate a corpus PAST TwoLevelMin
  * (nlist > 16384 ⇒ N > 4.096M vectors), run dedup_semantic end-to-end
  * on the two-level face, and measure the flat broadcast face's
  * assignment pass on the same corpus + the cell-agreement rate between
  * the faces — the asymptotic-fix evidence (docs/PLANS_r18.md). */
object TwoLevelDrive {
  def main(args: Array[String]): Unit = {
    val s = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val real = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_scale/x2l"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val fit = graft.ScaleCorpus.fitEmbeddings(s, real)
      graft.ScaleCorpus.generateEmbeddings(s, fit, 2080, 2016L,
        s"$dir/embeddings.parquet")
    }
    val n = graft.Tables.embeddings(s, dir).count()
    val nlist = Similarity.adaptiveNlist(n)
    println(s"##X2L## vectors=$n nlist=$nlist twoLevel=${nlist > Similarity.TwoLevelMin}")

    val emb = graft.Tables.embeddings(s, dir).repartition(64)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(Similarity.dotCol("embedding", "embedding")))

    // assignment-pass walls, both faces (noop write forces every column)
    def timePass(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(s"##X2L## assign_$tag wall=${(System.nanoTime() - t0) / 1e9}")
    }
    val cents = Similarity.seededCentsDf(emb, nlist)
    timePass("two_level",
      Similarity.assignCellsWithSimTwoLevel(emb, cents, nlist))
    timePass("flat_bcast", Similarity.assignCellsWithSimBcast(emb, cents))

    // agreement between the faces (full corpus)
    val tl = Similarity.assignCellsWithSimTwoLevel(emb, cents, nlist)
      .select(col("vec_id"), col("cell").as("tl_cell"))
    val fl = Similarity.assignCellsWithSimBcast(emb, cents)
      .select(col("vec_id"), col("cell").as("fl_cell"))
    val agg = tl.join(fl, "vec_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("tl_cell") === col("fl_cell"), 1L).otherwise(0L)).as("eq"))
      .collect()(0)
    println(s"##X2L## agreement=${agg.getLong(1)}/${agg.getLong(0)} " +
      s"= ${agg.getLong(1).toDouble / agg.getLong(0)}")

    // the full query, end-to-end, on the natural (two-level) face
    val q = graft.SparkEntry.queries("dedup_semantic")(s, dir)
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = q.count()
      println(s"##X2L## run$i rows=$rows wall=${(System.nanoTime() - t0) / 1e9}")
    }
    s.stop()
  }
}
