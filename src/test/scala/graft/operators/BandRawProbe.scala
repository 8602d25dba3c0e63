package graft.operators

import org.apache.spark.sql.functions._

/** Band-recall probe (r19): measured pair recall of the ADAPTIVE-rung
  * banded dedup vs exhaustive exact-cosine threshold pairs, at corpora
  * big enough to leave the 40×6 floor (RecallSuite pins the floor at
  * sf0.1; this is the re-measurement the re-parameterization owes).
  * Brute force is test-only — quadratic by construction. */
object BandRawProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x10")
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = Similarity.embeddingsCountFor(spark, dir)
    val (r, b) = Similarity.adaptiveBandParams(n)
    val e = graft.Tables.embeddings(spark, dir).repartition(64)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val bb = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val exact = a.crossJoin(bb).filter(col("id1") < col("id2"))
      .filter(graft.functions.VectorFunctions.cosineSimilarity(
        col("e1"), col("e2")) >= 0.45)
      .select(col("id1"), col("id2"))
    val exactN = exact.count()
    graft.ScaleReport.settle(spark)
    val banded = Similarity.embeddingCosinePairs(spark, dir)
      .select(col("vec_id_keeper").as("id1"), col("vec_id_dropped").as("id2"))
    val hit = banded.join(exact, Seq("id1", "id2")).count()
    val fp = banded.join(exact, Seq("id1", "id2"), "left_anti").count()
    println(f"##RECALL## n=$n rung=${r}x$b exact=$exactN banded_hits=$hit " +
      f"false_pos=$fp recall=${hit.toDouble / math.max(1L, exactN)}%.4f")
    spark.stop()
  }
}
