package graft.operators

import org.apache.spark.sql.functions._

/** r18: does the two-level face preserve the DEDUP contract? At a scale
  * where the flat face is cheap (500k vectors, nlist 2000, groups 44),
  * build the semantic-dedup DROPPED set from both assignments and
  * measure cell agreement + dropped-set recall vs flat. */
object TwoLevelRecallProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_scale/x2lr"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val fit = graft.ScaleCorpus.fitEmbeddings(s, "/root/testdata/sf0.1")
      graft.ScaleCorpus.generateEmbeddings(s, fit, 250, 2016L,
        s"$dir/embeddings.parquet")
    }
    val emb = graft.Tables.embeddings(s, dir).repartition(64)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(Similarity.dotCol("embedding", "embedding")))
    val n = emb.count()
    val nlist = Similarity.adaptiveNlist(n)
    println(s"##REC## vectors=$n nlist=$nlist groups=${Similarity.twoLevelGroups(nlist)}")
    val cents = Similarity.seededCentsDf(emb, nlist)

    def dropped(assigned: org.apache.spark.sql.DataFrame): Set[Long] =
      Similarity.semanticDropped(emb, assigned.localCheckpoint(false))
        .collect().map(_.getLong(0)).toSet

    val flatA = Similarity.assignCellsWithSimBcast(emb, cents)
    val tlA = Similarity.assignCellsWithSimTwoLevel(emb, cents, nlist)
    val agree = tlA.select(col("vec_id"), col("cell").as("t"))
      .join(flatA.select(col("vec_id"), col("cell").as("f")), "vec_id")
      .agg(avg(when(col("t") === col("f"), 1.0).otherwise(0.0))).collect()(0).getDouble(0)
    println(s"##REC## cell_agreement=$agree")
    val df = dropped(flatA)
    val dt = dropped(tlA)
    println(s"##REC## dropped_flat=${df.size} dropped_two_level=${dt.size} " +
      s"inter=${(df & dt).size} recall_vs_flat=${(df & dt).size.toDouble / math.max(1, df.size)}")
    s.stop()
  }
}
