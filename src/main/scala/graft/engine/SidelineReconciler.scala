package graft.engine

import graft.sideline.SidelinePayload

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.util.control.NonFatal

/**
 * The SL4 reconcile loop — reference SidelineSpoutHandler.java:196-214:
 * after open(), a Timer re-runs loadSidelines() every
 * `sideline.refresh_interval_seconds` (default 600) so that sidelines
 * persisted by a peer (or orphaned by a crash) are re-applied — a crashed
 * RESUME replay gets relaunched instead of silently staying dead.
 *
 * Spark shape: the engine's control store is the source of truth;
 * `onPayload` receives every persisted request each cycle and is expected
 * to be IDEMPOTENT — typical implementation checks the coordinator's
 * running-query registry and (re)launches the replay/bounded drain only
 * when no live query exists for that request id (the same contract as the
 * reference's loadSidelines re-applying filters and re-opening virtual
 * spouts that already exist as no-ops, SidelineSpoutHandler.java:227-322).
 */
final class SidelineReconciler(
    engine: SidelineEngine,
    refreshIntervalSeconds: Long,
    onPayload: SidelinePayload => Unit) extends AutoCloseable {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  @volatile private var executor: ScheduledExecutorService = _

  /** Run one reconcile pass now (also called by every timer tick).
    * Per-payload failures are logged and do not abort the pass. */
  def runOnce(): Unit =
    engine.loadSidelines().foreach { p =>
      try onPayload(p)
      catch {
        case NonFatal(e) =>
          log.warn(s"sideline reconcile for ${p.id} failed: ${e.getMessage}")
      }
    }

  /** Start the periodic loop (daemon thread); the first pass runs
    * immediately — the reference applies persisted sidelines BEFORE the
    * firehose starts (filters-before-firehose, :316-321), so call this
    * before launching the firehose query. */
  def start(): Unit = synchronized {
    require(executor == null, "reconciler already started")
    executor = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-sideline-reconciler")
      t.setDaemon(true)
      t
    })
    executor.scheduleWithFixedDelay(() => runOnce(), 0L,
      refreshIntervalSeconds, TimeUnit.SECONDS)
    ()
  }

  override def close(): Unit = synchronized {
    if (executor != null) { executor.shutdownNow(); executor = null }
  }
}
