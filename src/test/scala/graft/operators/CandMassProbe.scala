package graft.operators

import org.apache.spark.sql.functions._

/** One-off measurement main (r18): raw vs distinct candidate mass of
  * the embedding-cosine band join at a given corpus dir. */
object CandMassProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x10")
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir).repartition(64)
      .select(col("vec_id"), col("embedding"))
    val bands = emb.select(col("vec_id"),
      explode(graft.functions.VectorFunctions.srpBandCodes(
        col("embedding"), 6, 40)).as("band"))
      .repartition(col("band"))
    val pairs = SkewGuard.pairs(bands, "vec_id")
      .select(col("vec_id_1"), col("vec_id_2"))
    val raw = pairs.count()
    val dist = pairs.distinct().count()
    println(s"##CAND## raw=$raw distinct=$dist ratio=${raw.toDouble / dist}")
    spark.stop()
  }
}
