package graft.engine

/**
 * Lifecycle hooks — the reference's SpoutHandler / VirtualSpoutHandler
 * extension point (dynamic/handler/SpoutHandler.java,
 * VirtualSpoutHandler.java; no-ops NoopSpoutHandler/NoopVirtualSpoutHandler;
 * wired at DynamicSpout.open:215-217 and VirtualSpout.open:224-227, with
 * the completion hook at VirtualSpout.close:232-237).
 *
 * Mapping: the container spout's open/close become engine open/close;
 * each virtual spout's open/close/completion become per-query hooks
 * (a query is the engine's virtual spout). Implementations must be
 * cheap and exception-safe — hook failures are swallowed and logged, the
 * data path never depends on them (the reference likewise isolates
 * handler errors from the spout loop).
 */
trait EngineHooks {
  /** Engine assembled (reference SpoutHandler.onSpoutOpen). */
  def onEngineOpen(runtime: GraftRuntime): Unit = ()

  /** Engine closing (reference SpoutHandler.onSpoutClose). */
  def onEngineClose(runtime: GraftRuntime): Unit = ()

  /** A query launched under the coordinator (VirtualSpoutHandler.onVirtualSpoutOpen). */
  def onQueryStart(name: String): Unit = ()

  /** A query removed/stopped (VirtualSpoutHandler.onVirtualSpoutClose). */
  def onQueryStop(name: String): Unit = ()

  /** A bounded query drained its window and self-completed
    * (VirtualSpoutHandler.onVirtualSpoutCompletion — the sideline cleanup
    * hook). Fired by BoundedDrain completions routed through the
    * coordinator's owner. */
  def onQueryCompletion(name: String): Unit = ()
}

object EngineHooks {
  /** Reference NoopSpoutHandler/NoopVirtualSpoutHandler. */
  object Noop extends EngineHooks

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Run one hook, isolating failures from the data path. */
  private[engine] def safely(what: String)(f: => Unit): Unit =
    try f catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"engine hook $what failed: ${e.getMessage}")
    }
}
