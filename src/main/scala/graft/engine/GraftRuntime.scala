package graft.engine

import graft.sideline.{SidelinePayload, SidelineTrigger}
import graft.sources.LogSource
import org.apache.spark.sql.SparkSession

/**
 * The assembled engine — the reference's opinionated preset
 * (sideline/SidelineSpout.java:40-66: a DynamicSpout with the sideline
 * handlers pre-wired) extended to the full control plane: one call wires
 * store + engine + coordinator + trigger + reconcile loop from string
 * config (GraftConfig, reference FactoryManager/SpoutConfig), so a
 * deployment needs no Scala beyond providing the log source and sinks.
 *
 * Order of operations mirrors the reference's race-avoidance rule
 * (filters-before-firehose, SidelineSpoutHandler.java:316-321): the
 * control store is read and the trigger/reconciler installed BEFORE the
 * caller launches the firehose, so the first micro-batch already sees
 * every persisted drop-predicate.
 */
final class GraftRuntime(
    val spark: SparkSession,
    val log: LogSource,
    val config: GraftConfig) extends AutoCloseable {

  val hooks: EngineHooks = config.engineHooks
  val engine: SidelineEngine = new SidelineEngine(log, config.controlStore)
  val coordinator: QueryCoordinator =
    new QueryCoordinator(spark, config.maxConcurrentQueries, hooks)

  /** The configured trigger, wired to this engine's controller and opened
    * (polling). None when no sideline.trigger_class is configured. */
  val trigger: Option[SidelineTrigger] = config.sidelineTrigger.map { t =>
    t.setSidelineController(engine.controller(spark))
    t.open(config.settings)
    t
  }

  @volatile private var reconciler: Option[SidelineReconciler] = None

  EngineHooks.safely("onEngineOpen")(hooks.onEngineOpen(this))

  /** Install the SL4 reconcile loop. `onPayload` must be idempotent (it
    * receives every persisted request each cycle — check the
    * coordinator's registry before relaunching). Runs one pass
    * immediately; call before launching the firehose. */
  def startReconciler(onPayload: SidelinePayload => Unit): SidelineReconciler =
    synchronized {
      require(reconciler.isEmpty, "reconciler already started")
      val r = new SidelineReconciler(engine, config.refreshIntervalSeconds, onPayload)
      r.start()
      reconciler = Some(r)
      r
    }

  override def close(): Unit = {
    reconciler.foreach(_.close())
    trigger.foreach(_.close())
    coordinator.close()
    EngineHooks.safely("onEngineClose")(hooks.onEngineClose(this))
  }
}
