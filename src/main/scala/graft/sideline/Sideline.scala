package graft.sideline

import graft.filter.FilterSpec
import graft.model.ConsumerState
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Sideline domain model — the reference's signature feature (SURVEY.md §2.9).
 *
 * A sideline is a dynamically-installed drop-predicate on the firehose plus
 * a replayable offset window for the dropped rows:
 *
 *   START   : snapshot current offsets, persist request, firehose starts
 *             dropping matching rows                    (SidelineSpoutHandler.start:359-383)
 *   RESUME  : launch a parallel query reading from the snapshot with the
 *             NEGATED predicate (only the dropped rows) (SidelineSpoutHandler.resume:404-466)
 *   RESOLVE : remove the firehose filter, snapshot ending offsets, the
 *             sideline query drains [start, end) and completes
 *                                                       (SidelineSpoutHandler.resolve:488-537)
 */
sealed abstract class SidelineType(val name: String)
object SidelineType {
  case object Start   extends SidelineType("START")
  case object Resume  extends SidelineType("RESUME")
  case object Resolve extends SidelineType("RESOLVE")

  val all: Seq[SidelineType] = Seq(Start, Resume, Resolve)

  /** Parser, reference SidelineType.fromValue:56-71. */
  def fromValue(v: String): SidelineType =
    all.find(_.name.equalsIgnoreCase(v)).getOrElse(
      throw new IllegalArgumentException(s"unknown sideline type: $v"))

  /** Legal transitions of the state machine. */
  def canTransition(from: SidelineType, to: SidelineType): Boolean = (from, to) match {
    case (Start, Resume)   => true
    case (Resume, Resolve) => true
    case _                 => false
  }
}

/** A request to sideline rows matching `step` — reference
 * sideline/trigger/SidelineRequest.java:33-82 (id + FilterChainStep). */
final case class SidelineRequest(id: String, step: FilterSpec)

/**
 * Persisted lifecycle state — reference SidelinePayload.java:35-132:
 * (type, id, step, startingState, endingState). `endingState` is None until
 * RESOLVE. This single record replaces the reference's per-partition ZK
 * znodes; offsets travel as ConsumerState JSON.
 */
final case class SidelinePayload(
    id: String,
    sidelineType: SidelineType,
    step: FilterSpec,
    startingState: ConsumerState,
    endingState: Option[ConsumerState]) {

  def transitionTo(t: SidelineType): SidelinePayload = {
    require(SidelineType.canTransition(sidelineType, t),
      s"illegal sideline transition ${sidelineType.name} -> ${t.name}")
    copy(sidelineType = t)
  }

  def toJson: String = {
    val o = JObject(
      "id" -> JString(id),
      "type" -> JString(sidelineType.name),
      "step" -> JsonMethods.parse(step.toJson),
      "starting_state" -> JsonMethods.parse(startingState.toJson),
      "ending_state" -> endingState.map(s => JsonMethods.parse(s.toJson)).getOrElse(JNull))
    JsonMethods.compact(JsonMethods.render(o))
  }
}

object SidelinePayload {
  def fromJson(json: String): SidelinePayload = {
    val o = JsonMethods.parse(json)
    def str(k: String): String = (o \ k) match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"bad $k: $other")
    }
    val ending = (o \ "ending_state") match {
      case JNull | JNothing => None
      case v => Some(ConsumerState.fromJson(JsonMethods.compact(JsonMethods.render(v))))
    }
    SidelinePayload(
      id = str("id"),
      sidelineType = SidelineType.fromValue(str("type")),
      step = FilterSpec.fromJValue(o \ "step"),
      startingState = ConsumerState.fromJson(
        JsonMethods.compact(JsonMethods.render(o \ "starting_state"))),
      endingState = ending)
  }
}
