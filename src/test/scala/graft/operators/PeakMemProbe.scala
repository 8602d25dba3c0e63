package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

import scala.collection.concurrent.TrieMap

/** One-off (r20): adjudicate the r19 gate suspect — `dedup_clusters`
  * ×10 peak task memory 8.55× (`dedup_embedding_cosine` 3.43×). The
  * hypothesis under test: the r19 sized verify-fetch face broadcasts an
  * embeddings relation that grows ∝ N up to the byte budget, and
  * BroadcastHashJoinExec charges the relation's estimated size to every
  * probing task's peakExecutionMemory — so the per-task watermark grows
  * with the corpus BY DESIGN (bounded by [[graft.operators.Similarity
  * .FetchBroadcastMaxBytes]]), while the shuffle-hash face's watermark
  * stays partition-sized.
  *
  * A/B: each query runs at x1 and x10 under face=auto (broadcast at
  * these corpus sizes) and face=shuffle (forced via
  * -Dgraft.verifyFetchFace), 3 reps each, recording the min-wall rep's
  * peak task memory plus the TOP-3 stages by per-stage peak — the stage
  * names say WHICH operator holds the watermark. Output to a file
  * (sbt log prefixes corrupt stdout JSON). */
object PeakMemProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/peakmem_ab_r20.txt")
    val spark = graft.Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageName = TrieMap.empty[Int, String]
    val stagePeak = TrieMap.empty[Int, Long]
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stageName.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n'))
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          stagePeak.updateWith(e.stageId) {
            case Some(p) => Some(math.max(p, e.taskMetrics.peakExecutionMemory))
            case None => Some(e.taskMetrics.peakExecutionMemory)
          }
    }
    spark.sparkContext.addSparkListener(listener)
    val probe = new graft.metrics.TaskMetricsProbe
    spark.sparkContext.addSparkListener(probe)
    val lines = scala.collection.mutable.ListBuffer.empty[String]

    def run(q: String, dir: String, face: String, rep: Int): (Double, Long, Seq[(String, Long)]) = {
      sys.props("graft.verifyFetchFace") = face
      graft.ScaleReport.settle(spark)
      stageName.clear(); stagePeak.clear()
      val label = s"$q@$dir/$face#$rep"
      spark.sparkContext.setJobGroup(label, label, interruptOnCancel = false)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally spark.sparkContext.clearJobGroup()
      val wall = (System.nanoTime() - t0) / 1e9
      probe.quiesce(sc = spark.sparkContext)
      val peak = probe.snapshot(label).map(_.peakTaskMemory).getOrElse(-1L)
      val top = stagePeak.toSeq.sortBy(-_._2).take(3).map { case (sid, p) =>
        (stageName.getOrElse(sid, s"stage $sid"), p)
      }
      (wall, peak, top)
    }

    for (q <- Seq("dedup_clusters", "dedup_embedding_cosine");
         face <- Seq("auto", "shuffle")) {
      val byDir = Seq("x1" -> "/tmp/graft_scale/x1", "x10" -> "/tmp/graft_scale/x10")
        .map { case (tag, dir) =>
          val reps = (1 to 3).map(i => run(q, dir, face, i))
          val best = reps.minBy(_._1)
          val peaks = reps.map(_._2)
          lines += f"$q $face $tag wall=${best._1}%.2f " +
            f"peaks=${peaks.map(p => f"${p / 1e6}%.1f").mkString("/")}MB " +
            s"top=${best._3.map { case (n, p) => f"$n:${p / 1e6}%.1fMB" }.mkString(" | ")}"
          tag -> best
        }.toMap
      val r = byDir("x10")._2.toDouble / math.max(1L, byDir("x1")._2)
      lines += f"$q $face peak_ratio_10x=$r%.2f wall_ratio=${byDir("x10")._1 / byDir("x1")._1}%.2f"
    }
    sys.props.remove("graft.verifyFetchFace")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"##PEAKMEM## wrote $out")
    spark.stop()
  }
}
