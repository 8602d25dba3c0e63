package graft.operators

import org.apache.spark.sql.functions._

/** r18 (extended r19): does the two-level face preserve the DEDUP
  * contract, and what does MULTI-PROBE buy? At a scale where the flat
  * face is cheap to compare (500k vectors, nlist 2000, groups 44),
  * build the semantic-dedup DROPPED set from the flat assignment and
  * from the two-level assignment at p ∈ {1,2,4,8,16} probes; report
  * cell agreement, dropped-set recall vs flat, and the ASSIGNMENT wall
  * per point — the recall-vs-cost curve the r18 verdict asked for
  * before the >5M-vector ceiling can be retired as documented. */
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
      .localCheckpoint()
    val n = emb.count()
    val nlist = Similarity.adaptiveNlist(n)
    println(s"##REC## vectors=$n nlist=$nlist groups=${Similarity.twoLevelGroups(nlist)}")
    val cents = Similarity.seededCentsDf(emb, nlist)

    def dropped(assigned: org.apache.spark.sql.DataFrame): Set[Long] =
      Similarity.semanticDropped(emb, assigned.localCheckpoint(false))
        .collect().map(_.getLong(0)).toSet

    def wallOf(assigned: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      assigned.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val flatA = Similarity.assignCellsWithSimBcast(emb, cents)
    val flatWall = wallOf(flatA)
    val df = dropped(flatA)
    val flatCells = flatA.select(col("vec_id"), col("cell").as("f"))
      .localCheckpoint(false)
    println(f"##REC## flat_assign_wall=$flatWall%.1f dropped_flat=${df.size}")
    // NO settle() here: the probe's own emb/flatCells localCheckpoints
    // are live across iterations, and settle unpersists every
    // checkpointed RDD (safe only between fully-rebuilt frames)
    Seq(1, 2, 4, 8, 16).foreach { p =>
      val tlA = Similarity.assignCellsWithSimTwoLevel(emb, cents, nlist, p)
      val tlWall = wallOf(tlA)
      val agree = tlA.select(col("vec_id"), col("cell").as("t"))
        .join(flatCells, "vec_id")
        .agg(avg(when(col("t") === col("f"), 1.0).otherwise(0.0)))
        .collect()(0).getDouble(0)
      val dt = dropped(tlA)
      println(f"##REC## probes=$p assign_wall=$tlWall%.1f " +
        f"speedup_vs_flat=${flatWall / tlWall}%.1f cell_agreement=$agree%.3f " +
        f"dropped=${dt.size} inter=${(df & dt).size} " +
        f"recall_vs_flat=${(df & dt).size.toDouble / math.max(1, df.size)}%.3f")
    }
    s.stop()
  }
}
