package graft.engine

import graft.retry.{ExponentialBackoffRetry, FailedTuplesFirstRetry, NeverRetry}
import graft.sideline.InMemoryControlStore
import org.scalatest.funsuite.AnyFunSuite

/** A RetryPolicy loadable purely by class name (reference FactoryManager
  * reflection path). */
final class CustomTestPolicy extends graft.retry.RetryPolicy {
  val retryLimit = 7
  def delayMs(failCount: Int): Long = 5L
  def retryAt(failedAtCol: org.apache.spark.sql.Column,
      failCountCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    failedAtCol
}

/** EngineHooks loadable purely by class name. */
final class CustomTestHooks extends EngineHooks

class GraftConfigSuite extends AnyFunSuite {

  test("defaults mirror the reference's shipped configuration") {
    val c = GraftConfig.default
    val p = c.retryPolicy.asInstanceOf[ExponentialBackoffRetry]
    assert(p.retryLimit === 25 && p.initialDelayMs === 1000L &&
      p.multiplier === 2.0 && p.maxDelayMs === 900000L)
    assert(c.maxConcurrentQueries === 10)
    assert(c.stateFlushIntervalMs === 30000L)
    assert(c.throttlePolicy.triggerRatio === 1)
  }

  test("preset names and reference class names resolve") {
    assert(GraftConfig(Map("spout.retry_manager.class" -> "never"))
      .retryPolicy === NeverRetry)
    assert(GraftConfig(Map("spout.retry_manager.class" ->
      "com.salesforce.storm.spout.dynamic.retry.FailedTuplesFirstRetryManager"))
      .retryPolicy === FailedTuplesFirstRetry)
    val tuned = GraftConfig(Map(
      "spout.retry_manager.retry_limit" -> "3",
      "spout.retry_manager.initial_delay_ms" -> "50")).retryPolicy
      .asInstanceOf[ExponentialBackoffRetry]
    assert(tuned.retryLimit === 3 && tuned.initialDelayMs === 50L)
  }

  test("reflection path instantiates user classes (FactoryManager)") {
    val p = GraftConfig(Map("spout.retry_manager.class" ->
      "graft.engine.CustomTestPolicy")).retryPolicy
    assert(p.retryLimit === 7)
  }

  test("control store wiring: memory preset, file requires dir, class name") {
    assert(GraftConfig(Map("sideline.persistence.class" -> "memory"))
      .controlStore.isInstanceOf[InMemoryControlStore])
    intercept[IllegalArgumentException](GraftConfig.default.controlStore)
    val dir = java.nio.file.Files.createTempDirectory("cfg").toString
    val store = GraftConfig(Map("sideline.persistence.dir" -> dir)).controlStore
    assert(store.list().isEmpty)
  }

  test("sideline trigger wiring: none by default, directory_watch preset, knobs") {
    assert(GraftConfig.default.sidelineTrigger.isEmpty)
    intercept[IllegalArgumentException](
      GraftConfig(Map("sideline.trigger_class" -> "directory_watch")).sidelineTrigger)
    val dir = java.nio.file.Files.createTempDirectory("cfg-trigger").toString
    val t = GraftConfig(Map(
      "sideline.trigger_class" -> "directory_watch",
      "sideline.trigger.watch_dir" -> dir)).sidelineTrigger
    assert(t.exists(_.isInstanceOf[graft.sideline.DirectoryWatchTrigger]))
    t.foreach(_.close())
    assert(GraftConfig.default.refreshIntervalSeconds === 600L)
    assert(GraftConfig(Map("sideline.refresh_interval_seconds" -> "30"))
      .refreshIntervalSeconds === 30L)
  }

  test("engine hooks wiring: noop default, reference class alias, user class") {
    assert(GraftConfig.default.engineHooks === EngineHooks.Noop)
    // the reference SpoutConfig key spelling is authoritative — a
    // reference-shaped config must NOT silently fall back to Noop
    assert(GraftConfig(Map("spout.spout_handler_class" ->
      "com.salesforce.storm.spout.dynamic.handler.NoopSpoutHandler"))
      .engineHooks === EngineHooks.Noop)
    val h = GraftConfig(Map("spout.spout_handler_class" ->
      "graft.engine.CustomTestHooks")).engineHooks
    assert(h.isInstanceOf[CustomTestHooks])
    // pre-r3 spelling stays as a compat alias; reference key wins
    val legacy = GraftConfig(Map("spout.handler.class" ->
      "graft.engine.CustomTestHooks")).engineHooks
    assert(legacy.isInstanceOf[CustomTestHooks])
    assert(GraftConfig(Map(
      "spout.spout_handler_class" -> "noop",
      "spout.handler.class" -> "graft.engine.CustomTestHooks"))
      .engineHooks === EngineHooks.Noop)
  }

  test("metrics recorder wiring: memory default, histogram preset, reference aliases") {
    assert(GraftConfig.default.metricsRecorder
      .isInstanceOf[graft.metrics.InMemoryMetricsRecorder])
    assert(GraftConfig(Map("spout.metrics.class" ->
      "com.salesforce.storm.spout.dynamic.metrics.LogRecorder"))
      .metricsRecorder.isInstanceOf[graft.metrics.InMemoryMetricsRecorder])
    val h = GraftConfig(Map(
      "spout.metrics.class" ->
        "com.salesforce.storm.spout.dynamic.metrics.DropwizardRecorder",
      "spout.metrics.time_bucket" -> "0")).metricsRecorder
    assert(h.isInstanceOf[graft.metrics.HistogramMetricsRecorder])
    // Dropwizard-style derived series: count/mean/p95/max per timer key
    h.time("op")(Thread.sleep(1))
    h.time("op")(Thread.sleep(2))
    h.count("acks", 5)
    val snap = h.snapshot()
    assert(snap("op.count") === 2.0)
    assert(snap("op.mean_ms") > 0.0)
    assert(snap("op.p95_ms") >= snap("op.mean_ms") - 1e-9)
    assert(snap("op.max_ms") >= snap("op.p95_ms"))
    assert(snap("acks") === 5.0)
    h.asInstanceOf[graft.metrics.HistogramMetricsRecorder].close()
  }

  test("throttle policy from config") {
    val t = GraftConfig(Map(
      "buffer.throttled_spout_id_regex" -> "sideline",
      "buffer.throttled_rate_per_trigger" -> "123",
      "buffer.throttled_trigger_ratio" -> "5")).throttlePolicy
    assert(t.ratePerTrigger("x:sideline:1") === 123L)
    assert(t.triggerIntervalMs("x:sideline:1", 100) === 500L)
    assert(t.ratePerTrigger("firehose") === 10000L)
  }
}
