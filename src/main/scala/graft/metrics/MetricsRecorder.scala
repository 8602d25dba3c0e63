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

/**
 * Histogram/timer recorder with a periodic log reporter — the
 * DropwizardRecorder member of the reference's recorder family
 * (dynamic/metrics/DropwizardRecorder.java:42-131: Counter/Histogram/
 * Timer registries + a reporter flushing on the configured time bucket,
 * SpoutConfig "spout.metrics.time_bucket"). Zero-dependency analogue:
 * timers feed a bounded sliding reservoir per key, and the snapshot
 * exposes Dropwizard-style derived series (`<key>.count/.mean_ms/
 * .p95_ms/.max_ms`); a daemon thread logs the full snapshot every
 * `timeBucketSeconds` (the LogRecorder/console-reporter role). Wired
 * through GraftConfig "spout.metrics.class".
 */
final class HistogramMetricsRecorder(
    timeBucketSeconds: Long = 60L,
    reservoirSize: Int = 1028) extends MetricsRecorder with AutoCloseable {

  private val counters = new ConcurrentHashMap[String, AtomicLong]()
  private val gauges = new ConcurrentHashMap[String, DoubleAdder]()
  private val reservoirs = new ConcurrentHashMap[String, HistogramMetricsRecorder.Reservoir]()

  private val reporter =
    if (timeBucketSeconds <= 0) None
    else Some {
      val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-metrics-reporter"); t.setDaemon(true); t
      })
      ex.scheduleWithFixedDelay(() => report(), timeBucketSeconds,
        timeBucketSeconds, java.util.concurrent.TimeUnit.SECONDS)
      ex
    }

  override def count(key: String, delta: Long): Unit =
    counters.computeIfAbsent(key, _ => new AtomicLong()).addAndGet(delta)

  override def assign(key: String, value: Double): Unit = {
    val g = gauges.computeIfAbsent(key, _ => new DoubleAdder())
    g.reset(); g.add(value)
  }

  override def time[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally {
      val ms = (System.nanoTime() - t0) / 1e6
      reservoirs.computeIfAbsent(key,
        _ => new HistogramMetricsRecorder.Reservoir(reservoirSize)).add(ms)
    }
  }

  override def snapshot(): Map[String, Double] =
    counters.asScala.map { case (k, v) => k -> v.get.toDouble }.toMap ++
      gauges.asScala.map { case (k, v) => k -> v.sum }.toMap ++
      reservoirs.asScala.flatMap { case (k, r) => r.stats(k) }.toMap

  private def report(): Unit = {
    val snap = snapshot()
    if (snap.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        snap.toSeq.sortBy(_._1)
          .map { case (k, v) => f"$k=$v%.2f" }.mkString("metrics ", " ", ""))
  }

  override def close(): Unit = { reporter.foreach(_.shutdownNow()); () }
}

object HistogramMetricsRecorder {
  /** Bounded sliding-window reservoir (the Dropwizard
    * SlidingWindowReservoir shape): last `size` samples, lock-free
    * writes into a ring. */
  private[metrics] final class Reservoir(size: Int) {
    private val ring = new java.util.concurrent.atomic.AtomicReferenceArray[java.lang.Double](size)
    private val n = new AtomicLong()

    def add(v: Double): Unit = {
      val i = (n.getAndIncrement() % size).toInt
      ring.set(i, v)
    }

    def stats(key: String): Map[String, Double] = {
      val vals = (0 until math.min(n.get(), size.toLong).toInt)
        .flatMap(i => Option(ring.get(i)).map(_.doubleValue)).sorted
      if (vals.isEmpty) Map(s"$key.count" -> n.get().toDouble)
      else Map(
        s"$key.count" -> n.get().toDouble,
        s"$key.mean_ms" -> vals.sum / vals.size,
        s"$key.p95_ms" -> vals(math.min(vals.size - 1, (vals.size * 0.95).toInt)),
        s"$key.max_ms" -> vals.last)
    }
  }
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
    // Live lag gauge — the reference publishes per-partition
    // currentOffset/endOffset/lag every 30 s (kafka/Consumer.java:373-426).
    // Spark's SourceProgress carries the same data: endOffset = where this
    // batch ended, latestOffset = the source's current head; both are
    // partition-offset JSON for partitioned sources (Kafka).
    p.sources.zipWithIndex.foreach { case (s, i) =>
      StreamingMetricsBridge.lagBetween(s.latestOffset, s.endOffset).foreach { lags =>
        lags.foreach { case (cp, lag) =>
          recorder.assign(
            s"$name.source$i.lag.${cp.namespace}.${cp.partition}", lag.toDouble)
        }
        recorder.assign(s"$name.source$i.lag", lags.values.sum.toDouble)
      }
    }
  }
}

object StreamingMetricsBridge {
  def install(spark: SparkSession, recorder: MetricsRecorder): StreamingMetricsBridge = {
    val b = new StreamingMetricsBridge(recorder)
    spark.streams.addListener(b)
    b
  }

  /** Per-partition lag = latestOffset − endOffset, for sources whose
    * progress offsets are partition-offset JSON ({"topic":{"0":off}} —
    * Kafka's wire form, which ConsumerState shares). Non-partitioned
    * sources (file/rate) report other shapes and yield None. Clamped at 0:
    * a head observed before the batch planned can trail the batch end. */
  private[metrics] def lagBetween(latestJson: String, endJson: String)
      : Option[Map[graft.model.ConsumerPartition, Long]] =
    for {
      latest <- parseOffsets(latestJson)
      end <- parseOffsets(endJson)
    } yield latest.offsets.map { case (cp, lo) =>
      cp -> math.max(0L, lo - end.offsets.getOrElse(cp, lo))
    }

  private def parseOffsets(json: String): Option[graft.model.ConsumerState] =
    Option(json).flatMap { j =>
      try {
        val s = graft.model.ConsumerState.fromJson(j)
        if (s.offsets.nonEmpty) Some(s) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
}
