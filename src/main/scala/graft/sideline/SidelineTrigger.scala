package graft.sideline

import graft.filter.FilterSpec
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/**
 * The sideline control-plane surface (SURVEY.md §2.9 SL6/SL7) — how an
 * EXTERNAL actor requests a sideline without touching driver code.
 *
 * Reference shape:
 *  - SidelineController (sideline/handler/SidelineController.java:35):
 *    the start/resume/resolve API a trigger drives;
 *  - SidelineTrigger (sideline/trigger/SidelineTrigger.java:35-60):
 *    pluggable signal source, handed the controller at wiring time
 *    (SidelineSpoutHandler.createSidelineTriggers:650-672);
 *  - ZookeeperWatchTrigger (sideline/recipes/trigger/zookeeper/
 *    ZookeeperWatchTrigger.java:61-382): a Curator watch over a directory
 *    of TriggerEvent JSON docs, marking each processed after handling.
 *
 * Spark-first, zero-egress analogue: [[DirectoryWatchTrigger]] polls a
 * shared-filesystem control directory (HDFS/S3/NFS mount at scale) for
 * [[TriggerEvent]] JSON documents — one file per event, atomically
 * rewritten with processed=true after the controller accepts it. The
 * watcher is a driver-side daemon thread; data never flows through it,
 * only control rows.
 */
trait SidelineController {
  def isStarted(id: String): Boolean
  def isResumed(id: String): Boolean
  def isResolving(id: String): Boolean
  def start(req: SidelineRequest): SidelinePayload
  def resume(id: String): SidelinePayload
  def resolve(id: String): SidelinePayload
}

/** Pluggable signal source — reference SidelineTrigger.java:35-60. */
trait SidelineTrigger extends AutoCloseable {
  def setSidelineController(controller: SidelineController): Unit
  def open(config: Map[String, String]): Unit = {}
  override def close(): Unit = {}
}

/**
 * One control-plane document — reference TriggerEvent.java:42-192:
 * (type, filterChainStep, createdAt, createdBy, description, processed,
 * updatedAt). The creator writes processed=false; the trigger flips it to
 * true after the controller handles it, so operators can distinguish
 * handled from pending events.
 */
final case class TriggerEvent(
    sidelineType: SidelineType,
    step: FilterSpec,
    createdAtMillis: Option[Long],
    createdBy: String,
    description: String,
    processed: Boolean) {

  /** Stable identity: md5 of the step JSON, createdAt millis appended for
    * uniqueness — reference TriggerEvent.getIdentifier:112-125 (the
    * FilterChainStep IS the identity; its properties must make the
    * sideline unique, e.g. the tenant key being skipped). */
  def identifier: String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(step.toJson.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    createdAtMillis.fold(md5)(ts => s"$md5-$ts")
  }

  def markProcessed: TriggerEvent = copy(processed = true)

  def toJson: String = JsonMethods.compact(JsonMethods.render(JObject(
    "type" -> JString(sidelineType.name),
    "step" -> JsonMethods.parse(step.toJson),
    "created_at" -> createdAtMillis.map(JLong(_)).getOrElse(JNull),
    "created_by" -> JString(createdBy),
    "description" -> JString(description),
    "processed" -> JBool(processed))))
}

object TriggerEvent {
  def fromJson(json: String): TriggerEvent = {
    val o = JsonMethods.parse(json)
    def str(k: String): String = (o \ k) match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"bad $k: $other")
    }
    val createdAt = (o \ "created_at") match {
      case JInt(i)  => Some(i.toLong)
      case JLong(l) => Some(l)
      case _        => None
    }
    val processed = (o \ "processed") match {
      case JBool(b) => b
      case _        => false
    }
    TriggerEvent(
      sidelineType = SidelineType.fromValue(str("type")),
      step = FilterSpec.fromJValue(o \ "step"),
      createdAtMillis = createdAt,
      createdBy = str("created_by"),
      description = str("description"),
      processed = processed)
  }
}

/**
 * Watched-control-directory trigger — the zero-egress analogue of
 * ZookeeperWatchTrigger.java:61-382. A daemon thread polls `watchDir`
 * every `pollIntervalMs` for unprocessed TriggerEvent docs, applies each
 * through the controller (START ⇒ start, RESUME ⇒ resume, RESOLVE ⇒
 * resolve — idempotent against current state, mirroring the reference's
 * handleSideline checks), then atomically rewrites the doc with
 * processed=true. Errors on one event are logged and do not block others
 * (the reference likewise catches per-event, ZookeeperWatchTrigger
 * listener wiring at :109-160).
 *
 * Precondition-unmet docs do NOT retry forever: a RESUME/RESOLVE doc
 * whose sideline never reaches the required state (typo'd identifier, or
 * a sideline already completed and cleared so no status bit is set) is
 * retried for `maxUnmetPolls` scans and then QUARANTINED — renamed to
 * `<name>.quarantined` (out of the polled `*.json` namespace, still in
 * the dir for operators to inspect) with a loud error log. Without the
 * bound the watch dir never drains and every poll re-reads and re-applies
 * the dead doc.
 */
final class DirectoryWatchTrigger(
    watchDir: String,
    pollIntervalMs: Long = 1000L,
    maxUnmetPolls: Int = 120) extends SidelineTrigger {

  private val root: Path = {
    val p = Paths.get(watchDir)
    Files.createDirectories(p)
    p
  }
  @volatile private var controller: SidelineController = _
  @volatile private var executor: ScheduledExecutorService = _
  // consecutive precondition-unmet polls per doc file name; entries are
  // dropped the moment a doc applies (or is quarantined), so the map is
  // bounded by the number of currently-stuck docs
  private val unmetPolls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  override def setSidelineController(c: SidelineController): Unit = controller = c

  override def open(config: Map[String, String]): Unit = {
    require(controller != null, "setSidelineController before open")
    executor = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, s"graft-sideline-trigger-$watchDir")
      t.setDaemon(true)
      t
    })
    executor.scheduleWithFixedDelay(() => pollOnce(), 0L, pollIntervalMs,
      TimeUnit.MILLISECONDS)
    ()
  }

  /** One scan — public so tests (and embedding code) can drive the
    * trigger deterministically without the timer thread. */
  def pollOnce(): Unit = {
    val files = {
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
    files.foreach { f =>
      try {
        val event = TriggerEvent.fromJson(Files.readString(f))
        if (!event.processed) {
          if (apply(event)) {
            unmetPolls.remove(f.getFileName.toString)
            rewrite(f, event.markProcessed)
          } else noteUnmet(f)
        }
      } catch {
        case NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"sideline trigger event $f failed: ${e.getMessage}")
      }
    }
  }

  /** Count a precondition-unmet poll; quarantine the doc past the bound. */
  private def noteUnmet(f: Path): Unit = {
    val n = unmetPolls.merge(f.getFileName.toString, 1, (a, b) => a + b)
    if (n >= maxUnmetPolls) {
      val target = f.resolveSibling(s"${f.getFileName}.quarantined")
      Files.move(f, target, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      unmetPolls.remove(f.getFileName.toString)
      org.slf4j.LoggerFactory.getLogger(getClass).error(
        s"sideline trigger doc $f precondition unmet after $maxUnmetPolls " +
          s"polls — QUARANTINED to $target; fix the doc (wrong identifier, " +
          "or its sideline already completed) and rename it back to .json to retry")
    }
  }

  /** Apply one event against the controller. Returns true when the event
    * is DONE (it transitioned state now, or the state is already at/past
    * its target — redeploy-safe, the reference replays the whole event
    * dir on open) and may be marked processed. Returns false when the
    * event's PRECONDITION does not hold yet (e.g. a RESUME doc observed
    * one poll before its START overwrite lands): the doc stays
    * unprocessed so the next poll retries it, instead of being consumed
    * as a silent no-op that leaves the sideline stuck until an operator
    * republishes. */
  private def apply(event: TriggerEvent): Boolean = {
    val id = event.identifier
    def started = controller.isStarted(id)
    def resumed = controller.isResumed(id)
    def resolving = controller.isResolving(id)
    event.sidelineType match {
      case SidelineType.Start =>
        if (!started && !resumed && !resolving) {
          controller.start(SidelineRequest(id, event.step)); ()
        }
        true // START has no precondition: applied now or already past
      case SidelineType.Resume =>
        if (started) { controller.resume(id); true }
        else resumed || resolving // already past START+RESUME, or retry
      case SidelineType.Resolve =>
        if (resumed) { controller.resolve(id); true }
        else resolving // already resolving, or retry until RESUME lands
    }
  }

  private def rewrite(f: Path, event: TriggerEvent): Unit = {
    val tmp = f.resolveSibling(s".${f.getFileName}.tmp")
    Files.writeString(tmp, event.toJson)
    Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  override def close(): Unit = {
    if (executor != null) { executor.shutdownNow(); () }
  }
}

object DirectoryWatchTrigger {
  /** Helper for operators/tests: write an unprocessed TriggerEvent doc
    * into a watch directory (the TriggerEventHelper role,
    * sideline/recipes/trigger/TriggerEventHelper.java). Returns the
    * event's identifier (= the sideline request id it will create). */
  def publish(watchDir: String, event: TriggerEvent): String = {
    val dir = Paths.get(watchDir)
    Files.createDirectories(dir)
    val target = dir.resolve(s"${event.identifier}.json")
    val tmp = dir.resolve(s".${event.identifier}.tmp")
    Files.writeString(tmp, event.toJson)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    event.identifier
  }
}
