package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

import scala.collection.concurrent.TrieMap

/** Aggregated executor-side resource footprint of one labeled query run —
  * the memory/shuffle numbers that sit next to the recall numbers in the
  * per-round METRICS artifact, so the 100×-scale claim carries a MEASURED
  * byte count, not just a plan shape.
  *
  * All sums are across every task of every job that ran under the label;
  * `peakTaskMemory` is the max single-task execution-memory watermark
  * (the number that decides whether a task fits an executor slot at the
  * target SF — sizing guidance reads `peak × shuffle.partitions /
  * executor.cores` against executor memory). */
final class ResourceStats {
  var shuffleWriteBytes: Long = 0L
  var shuffleReadBytes: Long = 0L
  var memSpillBytes: Long = 0L
  var diskSpillBytes: Long = 0L
  var peakTaskMemory: Long = 0L
  var inputBytes: Long = 0L
  var tasks: Long = 0L

  /** Consistent copy taken under the same lock the bus thread writes
    * under — the only sanctioned way to read these fields from another
    * thread (a bare field read has no happens-before edge to the
    * listener's writes and may observe stale values indefinitely). */
  private[metrics] def copySnapshot(): ResourceStats = synchronized {
    val c = new ResourceStats
    c.shuffleWriteBytes = shuffleWriteBytes
    c.shuffleReadBytes = shuffleReadBytes
    c.memSpillBytes = memSpillBytes
    c.diskSpillBytes = diskSpillBytes
    c.peakTaskMemory = peakTaskMemory
    c.inputBytes = inputBytes
    c.tasks = tasks
    c
  }
}

/** SparkListener aggregating task metrics PER JOB GROUP: label a run with
  * `sc.setJobGroup(name, …)`, execute any action, then read
  * [[snapshot]](name). Every job the action spawns (AQE re-plans included
  * — they inherit the thread's job group) lands in the same bucket.
  *
  * Events post asynchronously on the listener bus, so callers must
  * [[quiesce]] between the action returning and reading a snapshot. */
final class TaskMetricsProbe extends SparkListener {
  private val stageGroup = TrieMap.empty[Int, String]
  private val stats = TrieMap.empty[String, ResourceStats]

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val grp =
      if (e.properties == null) null
      else e.properties.getProperty("spark.jobGroup.id")
    if (grp != null) e.stageIds.foreach(s => stageGroup.put(s, grp))
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    for (grp <- stageGroup.get(e.stageId); m = e.taskMetrics; if m != null) {
      val s = stats.getOrElseUpdate(grp, new ResourceStats)
      s.synchronized {
        s.shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        s.shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
        s.memSpillBytes += m.memoryBytesSpilled
        s.diskSpillBytes += m.diskBytesSpilled
        s.peakTaskMemory = math.max(s.peakTaskMemory, m.peakExecutionMemory)
        s.inputBytes += m.inputMetrics.bytesRead
        s.tasks += 1
      }
    }

  /** Wait until the listener bus has drained this probe's events.
    *
    * Preferred path: the bus's own `waitUntilEmpty(maxWaitMs)` — exact
    * (an empty bus means every posted event was delivered), but
    * `private[spark]` in source, so it is reached reflectively through
    * the bytecode-public accessors. Fallback (no context given or
    * reflection fails): poll the total task count until it holds still
    * for `settleMs` — a heuristic that can under-count if the bus
    * stalls longer than the settle window mid-drain, hence the stderr
    * warning when `maxWaitMs` is exhausted without stability. */
  def quiesce(settleMs: Long = 300, maxWaitMs: Long = 10000,
      sc: org.apache.spark.SparkContext = null): Unit = {
    if (sc != null && busDrained(sc, maxWaitMs)) return
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var last = -1L
    var stableSince = System.nanoTime()
    while (System.nanoTime() < deadline) {
      // read under each stats object's lock — establishes the
      // happens-before edge with the bus thread's synchronized writes
      val now = stats.values.map(s => s.synchronized(s.tasks)).sum
      if (now != last) { last = now; stableSince = System.nanoTime() }
      else if (System.nanoTime() - stableSince > settleMs * 1000000L) return
      Thread.sleep(50)
    }
    System.err.println(
      s"[TaskMetricsProbe] quiesce: task count never held still for " +
        s"${settleMs}ms within ${maxWaitMs}ms — snapshot may under-count")
  }

  /** Reflective `sc.listenerBus.waitUntilEmpty(timeoutMs)`. Returns true
    * iff the bus reported empty (TimeoutException / any reflection
    * failure → false, caller falls back to the polling heuristic). */
  private[metrics] def busDrained(
      sc: org.apache.spark.SparkContext, timeoutMs: Long): Boolean =
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", java.lang.Long.TYPE)
        .invoke(bus, java.lang.Long.valueOf(timeoutMs))
      true
    } catch {
      case e: java.lang.reflect.InvocationTargetException
          if e.getCause.isInstanceOf[java.util.concurrent.TimeoutException] =>
        System.err.println(
          s"[TaskMetricsProbe] quiesce: listener bus still busy after " +
            s"${timeoutMs}ms — falling back to settle polling")
        false
      case _: Throwable => false
    }

  /** Lock-consistent copy of the group's stats (never the live mutable
    * object the bus thread is still writing). */
  def snapshot(group: String): Option[ResourceStats] =
    stats.get(group).map(_.copySnapshot())
}
