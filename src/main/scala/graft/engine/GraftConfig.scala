package graft.engine

import graft.retry.{ExponentialBackoffRetry, FailedTuplesFirstRetry, NeverRetry, RetryPolicy}
import graft.sideline.{ControlStore, DirectoryWatchTrigger, FileControlStore, InMemoryControlStore, SidelineTrigger}

import scala.util.matching.Regex

/**
 * Config-driven wiring — the reference's FactoryManager + SpoutConfig
 * (dynamic/FactoryManager.java, config/SpoutConfig.java): every pluggable
 * resolved from string config so deployments swap implementations without
 * code. Key names mirror the reference's where a counterpart exists.
 *
 * Resolution order for classes: known preset name, then Class.forName
 * (the reference's reflection path — any class with a no-arg constructor
 * implementing the right trait).
 */
final case class GraftConfig(settings: Map[String, String]) {

  private def get(key: String): Option[String] = settings.get(key).map(_.trim)
  private def getLong(key: String, dflt: Long): Long =
    get(key).map(_.toLong).getOrElse(dflt)
  private def getInt(key: String, dflt: Int): Int =
    get(key).map(_.toInt).getOrElse(dflt)
  private def getDouble(key: String, dflt: Double): Double =
    get(key).map(_.toDouble).getOrElse(dflt)

  /** spout.retry_manager.class + spout.retry_manager.* knobs
    * (SpoutConfig.java:204,222,242,258,271). */
  def retryPolicy: RetryPolicy =
    get("spout.retry_manager.class").getOrElse("exponential_backoff") match {
      case "exponential_backoff" |
           "com.salesforce.storm.spout.dynamic.retry.ExponentialBackoffRetryManager" =>
        ExponentialBackoffRetry(
          retryLimit = getInt("spout.retry_manager.retry_limit", 25),
          initialDelayMs = getLong("spout.retry_manager.initial_delay_ms", 1000L),
          multiplier = getDouble("spout.retry_manager.delay_multiplier", 2.0),
          maxDelayMs = getLong("spout.retry_manager.retry_delay_max_ms", 900000L))
      case "failed_tuples_first" |
           "com.salesforce.storm.spout.dynamic.retry.FailedTuplesFirstRetryManager" =>
        FailedTuplesFirstRetry
      case "never" |
           "com.salesforce.storm.spout.dynamic.retry.NeverRetryManager" =>
        NeverRetry
      case className => instantiate[RetryPolicy](className)
    }

  /** Control store: preset "memory", a directory path via
    * sideline.persistence.dir, or a class name. */
  def controlStore: ControlStore =
    get("sideline.persistence.class").getOrElse("file") match {
      case "memory" => new InMemoryControlStore
      case "file" =>
        new FileControlStore(get("sideline.persistence.dir").getOrElse(
          throw new IllegalArgumentException(
            "sideline.persistence.dir required for the file control store")))
      case className => instantiate[ControlStore](className)
    }

  /** spout.coordinator.max_concurrent_virtual_spouts (SpoutConfig:398). */
  def maxConcurrentQueries: Int =
    getInt("spout.coordinator.max_concurrent_virtual_spouts",
      QueryCoordinator.DefaultMaxConcurrent)

  /** Throttle policy (ThrottledMessageBuffer/RatioMessageBuffer config
    * surface: regex + reduced rate + poll ratio). */
  def throttlePolicy: ThrottlePolicy = ThrottlePolicy(
    defaultRatePerTrigger = getLong("buffer.rate_per_trigger", 10000L),
    throttledRatePerTrigger = getLong("buffer.throttled_rate_per_trigger", 1000L),
    throttledPattern = get("buffer.throttled_spout_id_regex").map(new Regex(_)),
    triggerRatio = getInt("buffer.throttled_trigger_ratio", 1))

  /** Consumer-state flush cadence (SpoutConfig:374) — checkpoint commit
    * interval guidance for sinks that batch their own state. */
  def stateFlushIntervalMs: Long =
    getLong("spout.coordinator.consumer_state_flush_interval_ms", 30000L)

  /** SL4 reconcile cadence — reference sideline.refresh_interval_seconds
    * (SidelineConfig, default 600 s; timer at
    * SidelineSpoutHandler.java:196-214). */
  def refreshIntervalSeconds: Long =
    getLong("sideline.refresh_interval_seconds", 600L)

  /** O5 lifecycle hooks — reference spout.spout_handler_class
    * (SpoutConfig, DynamicSpout.open:215-217); default no-op. The old
    * non-reference spelling `spout.handler.class` stays as an alias so
    * existing configs keep working. */
  def engineHooks: EngineHooks =
    get("spout.spout_handler_class")
      .orElse(get("spout.handler.class")).getOrElse("noop") match {
      case "noop" |
           "com.salesforce.storm.spout.dynamic.handler.NoopSpoutHandler" =>
        EngineHooks.Noop
      case className => instantiate[EngineHooks](className)
    }

  /** SL6 pluggable trigger — reference sideline.trigger_class
    * (SidelineSpoutHandler.createSidelineTriggers:650-672). Preset
    * "directory_watch" (the zero-egress ZookeeperWatchTrigger analogue,
    * needs sideline.trigger.watch_dir) or any SidelineTrigger class name. */
  def sidelineTrigger: Option[SidelineTrigger] =
    get("sideline.trigger_class").map {
      case "directory_watch" |
           "com.salesforce.storm.spout.sideline.recipes.trigger.zookeeper.ZookeeperWatchTrigger" =>
        new DirectoryWatchTrigger(
          get("sideline.trigger.watch_dir").getOrElse(
            throw new IllegalArgumentException(
              "sideline.trigger.watch_dir required for the directory_watch trigger")),
          getLong("sideline.trigger.poll_interval_ms", 1000L))
      case className => instantiate[SidelineTrigger](className)
    }

  /** Metrics recorder — reference spout.metrics.class +
    * spout.metrics.time_bucket (SpoutConfig.java:288,299; default
    * LogRecorder, cluster deployments swap in DropwizardRecorder).
    * Presets: "memory" (InMemoryMetricsRecorder), "histogram" (the
    * DropwizardRecorder analogue with reservoir timers + a time-bucket
    * log reporter), or any MetricsRecorder class name. */
  def metricsRecorder: graft.metrics.MetricsRecorder =
    get("spout.metrics.class").getOrElse("memory") match {
      case "memory" |
           "com.salesforce.storm.spout.dynamic.metrics.LogRecorder" =>
        new graft.metrics.InMemoryMetricsRecorder
      case "histogram" |
           "com.salesforce.storm.spout.dynamic.metrics.DropwizardRecorder" =>
        new graft.metrics.HistogramMetricsRecorder(
          timeBucketSeconds = getLong("spout.metrics.time_bucket", 60L))
      case className => instantiate[graft.metrics.MetricsRecorder](className)
    }

  private def instantiate[T](className: String): T =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[T]
}

object GraftConfig {
  val default: GraftConfig = GraftConfig(Map.empty)
}
