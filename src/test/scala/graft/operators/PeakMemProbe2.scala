package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import scala.collection.concurrent.TrieMap

/** Stage-granular follow-up to [[PeakMemProbe]]: dump EVERY stage of one
  * dedup_clusters@x10 run with its callsite name, task count, and
  * per-stage max peakExecutionMemory — names the stage holding the
  * 304.7 MB watermark the face A/B proved face-independent. */
object PeakMemProbe2 {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("dedup_clusters")
    val dir = args.lift(1).getOrElse("/tmp/graft_scale/x10")
    val out = args.lift(2).getOrElse("/tmp/peakmem_stages_r20.txt")
    // optional 4th arg: spark.memory.fraction — shrinking the execution
    // pool proves the big watermarks are ELASTIC shuffle-write buffers
    // (they spill under pressure and the query still completes) rather
    // than hard per-task requirements
    val memFrac = args.lift(3)
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    memFrac.foreach(f => builder.config("spark.memory.fraction", f))
    val spark = graft.Tables.configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val peak = TrieMap.empty[Int, Long]
    val tasks = TrieMap.empty[Int, Int]
    val names = TrieMap.empty[Int, String]
    val spill = TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          peak.updateWith(e.stageId) {
            case Some(p) => Some(math.max(p, e.taskMetrics.peakExecutionMemory))
            case None => Some(e.taskMetrics.peakExecutionMemory)
          }
          tasks.updateWith(e.stageId) {
            case Some(t) => Some(t + 1); case None => Some(1)
          }
          spill.updateWith(e.stageId) {
            case Some(s) => Some(s + e.taskMetrics.diskBytesSpilled)
            case None => Some(e.taskMetrics.diskBytesSpilled)
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        names.put(e.stageInfo.stageId,
          e.stageInfo.rddInfos.sortBy(_.id).map(r =>
            r.name + (if (r.scope == null) "" else "(" +
              r.scope.map(sc => sc.name).getOrElse("") + ")")).mkString(" <- "))
    })
    // warm run (codegen, fixtures), then the measured run
    graft.SparkEntry.queries(q)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    graft.ScaleReport.settle(spark)
    peak.clear(); tasks.clear(); names.clear()
    graft.SparkEntry.queries(q)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(2000)
    val rows = graft.SparkEntry.queries(q)(spark, dir).count()
    val lines = f"query=$q rows=$rows memFrac=${memFrac.getOrElse("default")}" +:
      peak.toSeq.sortBy(-_._2).map { case (sid, p) =>
        f"stage=$sid peak=${p / 1e6}%.1fMB spill=${spill.getOrElse(sid, 0L) / 1e6}%.1fMB " +
          f"tasks=${tasks.getOrElse(sid, 0)} ${names.getOrElse(sid, "?")}"
      }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"##PEAKMEM2## wrote $out")
    spark.stop()
  }
}
