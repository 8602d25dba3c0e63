package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import scala.collection.concurrent.TrieMap

/** One completed stage's attributed footprint — the row of the
  * per-stage cost table that turns "this query's latency is fixed
  * overhead spread over N stages" from an inference into a measurement.
  * `wallMs` is the stage's own submission→completion span; stages of
  * one job overlap, so the per-stage walls can sum past the query
  * wall — they attribute, they don't partition. */
final case class StageStats(stageId: Int, name: String, wallMs: Long,
    tasks: Long, shuffleReadBytes: Long, shuffleWriteBytes: Long,
    inputBytes: Long, spillBytes: Long)

/** SparkListener recording PER-STAGE metrics for every job that runs
  * under a labeled job group (same labeling contract as
  * [[TaskMetricsProbe]]; quiesce with that probe's method or the bus
  * helper before reading). AQE re-planned stages appear as their own
  * rows — that is the point: the table shows which exchange actually
  * cost the wall. */
final class StageMetricsProbe extends SparkListener {
  private val stageGroup = TrieMap.empty[Int, String]
  private val taskAgg = TrieMap.empty[Int, Array[Long]] // tasks, sr, sw, in, spill
  private val done = TrieMap.empty[Int, StageStats]

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val grp =
      if (e.properties == null) null
      else e.properties.getProperty("spark.jobGroup.id")
    if (grp != null) e.stageIds.foreach(s => stageGroup.put(s, grp))
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (stageGroup.contains(e.stageId) && e.taskMetrics != null) {
      val a = taskAgg.getOrElseUpdate(e.stageId, new Array[Long](5))
      val m = e.taskMetrics
      a.synchronized {
        a(0) += 1
        a(1) += m.shuffleReadMetrics.totalBytesRead
        a(2) += m.shuffleWriteMetrics.bytesWritten
        a(3) += m.inputMetrics.bytesRead
        a(4) += m.memoryBytesSpilled + m.diskBytesSpilled
      }
    }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val info = e.stageInfo
    for (grp <- stageGroup.get(info.stageId); if grp != null) {
      val wall = (for (s <- info.submissionTime; c <- info.completionTime)
        yield c - s).getOrElse(0L)
      val a = taskAgg.getOrElse(info.stageId, new Array[Long](5))
      val snap = a.synchronized(a.clone())
      done.put(info.stageId, StageStats(info.stageId, info.name, wall,
        snap(0), snap(1), snap(2), snap(3), snap(4)))
    }
  }

  /** Completed stages of `group`, stage-id ordered (execution order). */
  def stages(group: String): Seq[StageStats] =
    done.toSeq.collect {
      case (id, st) if stageGroup.get(id).contains(group) => st
    }.sortBy(_.stageId)
}
