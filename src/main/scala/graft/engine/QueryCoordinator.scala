package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/**
 * Multi-query coordinator — the reference's SpoutCoordinator + buffers
 * re-expressed for Structured Streaming (SURVEY.md §2.7/2.8).
 *
 * Mapping:
 *  - SpoutCoordinator thread pool (coordinator/SpoutCoordinator.java:
 *    166-178, max 10 concurrent virtual spouts) → a concurrency cap on
 *    registered streaming queries;
 *  - RoundRobinBuffer fairness (buffer/RoundRobinBuffer.java:55-206) →
 *    fair scheduler pools: every query runs its micro-batches in its own
 *    pool so one hot source cannot starve the rest (requires
 *    spark.scheduler.mode=FAIR, see [[QueryCoordinator.configureFair]]);
 *  - ThrottledMessageBuffer (regex-matched smaller queues,
 *    buffer/ThrottledMessageBuffer.java:73-328) → [[ThrottlePolicy]]:
 *    id-regex → per-trigger rate option applied at launch;
 *  - RatioMessageBuffer (consumer-side 1/N polling,
 *    buffer/RatioMessageBuffer.java:76-401) → trigger-interval ratio;
 *  - MessageBus error queue (MessageBus.java:135-137) → a listener that
 *    captures query terminations with exceptions into an error queue the
 *    driver can drain;
 *  - monitor thread status reports (SpoutCoordinator.reportStatus:
 *    396-470) → [[status]] snapshots from StreamingQueryProgress.
 */
final class QueryCoordinator(
    spark: SparkSession,
    maxConcurrentQueries: Int = QueryCoordinator.DefaultMaxConcurrent,
    hooks: EngineHooks = EngineHooks.Noop) {

  final case class Registered(name: String, pool: String, query: StreamingQuery)

  private val registry = TrieMap.empty[String, Registered]
  private val errors = new ConcurrentLinkedQueue[(String, String)]()
  private val terminated = TrieMap.empty[java.util.UUID, String]

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      e.exception.foreach { msg =>
        errors.add(terminated.getOrElse(e.id, e.id.toString) -> msg)
      }
      terminated.remove(e.id)
    }
  }
  spark.streams.addListener(listener)

  /** Launch a query under the coordinator: enforces the concurrency cap,
    * pins the fair-scheduler pool for every micro-batch of this query,
    * and registers it for status/error tracking. `start` must create the
    * query (its foreachBatch/sink jobs inherit the pool local property). */
  def launch(name: String, pool: String = "default")
      (start: => StreamingQuery): StreamingQuery = synchronized {
    require(!registry.contains(name), s"query '$name' already registered")
    require(registry.size < maxConcurrentQueries,
      s"concurrency cap reached ($maxConcurrentQueries) — remove a query first " +
        "(reference: spout.coordinator.max_concurrent_virtual_spouts)")
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    try {
      val q = start
      registry.put(name, Registered(name, pool, q))
      terminated.put(q.id, name)
      EngineHooks.safely(s"onQueryStart($name)")(hooks.onQueryStart(name))
      q
    } finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
  }

  /**
   * Launch with throttle shaping applied — the wiring that makes
   * [[ThrottlePolicy]] real (r1 gap: the policy computed rates nothing
   * consumed). The policy resolves this query's admission rate
   * (maxOffsetsPerTrigger / maxFilesPerTrigger value) and trigger
   * interval (RatioMessageBuffer's 1/N polling as an interval multiple),
   * and hands them to the `start` thunk, which MUST apply them to its
   * source options and writer trigger — the reference throttles at the
   * buffer (ThrottledMessageBuffer.java:73-328); Spark throttles at
   * micro-batch admission, same effect one layer earlier.
   */
  def launchShaped(
      name: String,
      policy: ThrottlePolicy,
      baseTriggerMs: Long = 100L,
      pool: String = "default")
      (start: QueryCoordinator.Shaping => StreamingQuery): StreamingQuery =
    launch(name, pool)(start(QueryCoordinator.Shaping(
      ratePerTrigger = policy.ratePerTrigger(name),
      triggerIntervalMs = policy.triggerIntervalMs(name, baseTriggerMs))))

  /** Graceful stop of one query — reference removeVirtualSpout
    * (SpoutCoordinator.java:238-283). */
  def remove(name: String): Unit = synchronized {
    registry.remove(name).foreach { r =>
      if (r.query.isActive) r.query.stop()
      EngineHooks.safely(s"onQueryStop($name)")(hooks.onQueryStop(name))
    }
  }

  /** Report a bounded query's self-completion (BoundedDrain onComplete) —
    * deregisters and fires the completion hook
    * (VirtualSpoutHandler.onVirtualSpoutCompletion). */
  def completed(name: String): Unit = synchronized {
    registry.remove(name)
    EngineHooks.safely(s"onQueryCompletion($name)")(hooks.onQueryCompletion(name))
  }

  def get(name: String): Option[StreamingQuery] = registry.get(name).map(_.query)

  def activeNames: Seq[String] =
    registry.values.collect { case r if r.query.isActive => r.name }.toSeq.sorted

  /** Per-query progress snapshot (reference status report: emit/ack/fail
    * counts + per-partition progress become StreamingQueryProgress). */
  def status(): Seq[QueryCoordinator.QueryStatus] =
    registry.values.toSeq.sortBy(_.name).map { r =>
      val p = Option(r.query.lastProgress)
      QueryCoordinator.QueryStatus(
        name = r.name,
        pool = r.pool,
        active = r.query.isActive,
        batchId = p.map(_.batchId).getOrElse(-1L),
        numInputRows = p.map(_.numInputRows).getOrElse(0L),
        inputRowsPerSecond = p.map(_.inputRowsPerSecond).getOrElse(0.0))
    }

  /** Drain the error channel (reference DynamicSpout.nextTuple error
    * drain :226-229). */
  def drainErrors(): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var e = errors.poll()
    while (e != null) { out += e; e = errors.poll() }
    out.result()
  }

  /** Graceful close with bounded wait — reference close
    * (SpoutCoordinator.java:476-515, max_spout_shutdown_time_ms). */
  def close(maxWaitMs: Long = 10000L): Unit = synchronized {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    registry.values.foreach(r => if (r.query.isActive) r.query.stop())
    registry.values.foreach { r =>
      val left = math.max(0L, (deadline - System.nanoTime()) / 1000000L)
      try r.query.awaitTermination(left) catch { case _: Exception => () }
      EngineHooks.safely(s"onQueryStop(${r.name})")(hooks.onQueryStop(r.name))
    }
    registry.clear()
    spark.streams.removeListener(listener)
  }
}

object QueryCoordinator {
  /** Reference default: spout.coordinator.max_concurrent_virtual_spouts
    * (SpoutConfig.java:398). */
  val DefaultMaxConcurrent = 10

  final case class QueryStatus(name: String, pool: String, active: Boolean,
      batchId: Long, numInputRows: Long, inputRowsPerSecond: Double)

  /** Resolved launch-time throttle parameters for one query. */
  final case class Shaping(ratePerTrigger: Long, triggerIntervalMs: Long)

  /** Session configs for fair multi-query scheduling. Call when building
    * the SparkSession that hosts concurrent firehose + sideline queries. */
  def configureFair(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.scheduler.mode", "FAIR")
}

/**
 * Source-throttling policies — ThrottledMessageBuffer / RatioMessageBuffer
 * equivalents. In Spark, producer-side backpressure IS the per-trigger
 * admission limit, so throttling a source = lowering its rate option, and
 * a poll ratio = a longer trigger interval.
 */
final case class ThrottlePolicy(
    defaultRatePerTrigger: Long,
    throttledRatePerTrigger: Long,
    throttledPattern: Option[Regex],
    triggerRatio: Int = 1) {

  require(triggerRatio >= 1, "triggerRatio must be >= 1")

  def isThrottled(queryId: String): Boolean =
    throttledPattern.exists(_.findFirstIn(queryId).isDefined)

  /** maxFilesPerTrigger / maxOffsetsPerTrigger value for this query id. */
  def ratePerTrigger(queryId: String): Long =
    if (isThrottled(queryId)) throttledRatePerTrigger else defaultRatePerTrigger

  /** Trigger interval for this query id given the base interval —
    * RatioMessageBuffer's "polled 1/N as often". */
  def triggerIntervalMs(queryId: String, baseMs: Long): Long =
    if (isThrottled(queryId)) baseMs * triggerRatio else baseMs
}
