package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}

import scala.collection.concurrent.TrieMap

/** Round-20 optimization harness: one deterministic measurement row per
  * declared query — wall (2nd pass, warm), task/stage counts, shuffle
  * read/write bytes, input bytes, spill, peak task memory — plus the
  * `explain("formatted")` text of every query, dumped to files. The byte
  * and count columns are host-noise-free (identical across reps on one
  * build), so before/after optimization evidence reads from THEM; walls
  * are corroboration only (this session's host moved identical code
  * ±2× run-to-run — the r17 worktree-A/B lesson re-measured).
  *
  * Usage: Test/runMain graft.OptSweepProbe <out.jsonl> <plansDir>
  *          [dataDir] [q1,q2,...]
  * Output: one JSON line per query + `<plansDir>/<query>.txt`. */
object OptSweepProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/optsweep.jsonl")
    val plansDir = if (args.length > 1) args(1) else "/tmp/optsweep_plans"
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val subset = if (args.length > 3)
      Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet) else None
    new java.io.File(plansDir).mkdirs()

    val spark = Tables.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-job-group stage counter (TaskMetricsProbe counts tasks, not stages)
    val stageGroups = TrieMap.empty[Int, String]
    val stageCount = TrieMap.empty[String, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = if (e.properties == null) null
          else e.properties.getProperty("spark.jobGroup.id")
        if (grp != null) e.stageIds.foreach(stageGroups.put(_, grp))
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stageGroups.get(e.stageInfo.stageId).foreach(g =>
          stageCount.updateWith(g) { case Some(n) => Some(n + 1); case None => Some(1) })
    })
    val probe = new graft.metrics.TaskMetricsProbe
    spark.sparkContext.addSparkListener(probe)

    // warm the session the way Bench does
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, dir).limit(1).collect()

    val w = new java.io.PrintWriter(out)
    val selected = subset.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names(k) })
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // formatted plan of a FRESH frame (pre-execution, AQE initial)
      try {
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val pw = new java.io.PrintWriter(s"$plansDir/$name.txt")
        try pw.println(plan) finally pw.close()
      } catch { case e: Throwable =>
        System.err.println(s"[optsweep] $name explain failed: ${e.getMessage}")
      }
      def once(label: String): Double = {
        spark.sparkContext.setJobGroup(label, label, interruptOnCancel = false)
        val t0 = System.nanoTime()
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[optsweep] $name failed: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup()
        (System.nanoTime() - t0) / 1e9
      }
      once(s"$name#warm")
      val wall = once(name)
      probe.quiesce(sc = spark.sparkContext)
      val s = probe.snapshot(name).getOrElse(new graft.metrics.ResourceStats)
      val stages = stageCount.getOrElse(name, 0)
      w.println(f"""{"q":"$name","wall":$wall%.3f,"tasks":${s.tasks},"stages":$stages,"sw":${s.shuffleWriteBytes},"sr":${s.shuffleReadBytes},"in":${s.inputBytes},"spill":${s.memSpillBytes + s.diskSpillBytes},"peak":${s.peakTaskMemory}}""")
      w.flush()
    }
    w.close()
    spark.stop()
  }
}
