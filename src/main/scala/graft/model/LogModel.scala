package graft.model

import org.apache.spark.sql.types._

/**
 * Core data model of the engine: typed equivalents of the reference's
 * log-positional abstractions (see SURVEY.md §1.1).
 *
 * Reference constructs re-expressed:
 *  - Record    (dynamic/consumer/Record.java:33-78)        -> [[LogRecord]]
 *  - MessageId (dynamic/MessageId.java:33-126)             -> [[MessageId]]
 *  - ConsumerPartition (dynamic/ConsumerPartition.java)    -> [[ConsumerPartition]]
 *  - ConsumerState (dynamic/consumer/ConsumerState.java)   -> [[ConsumerState]]
 *  - VirtualSpoutIdentifier                                -> plain String `sourceId`
 *
 * Unlike the reference (untyped `Values` ArrayList), rows carry a fixed
 * StructType so Catalyst can prune/push down; the payload stays in `value`
 * (opaque string/binary) exactly as the reference keeps payloads opaque.
 */
final case class ConsumerPartition(namespace: String, partition: Int)

/** One consumed message before emit. `sourceId` identifies the virtual
 * consumer that produced it (firehose or a sideline replay). */
final case class LogRecord(
    namespace: String,
    partition: Int,
    offset: Long,
    key: String,
    value: String,
    sourceId: String,
    permanentlyFailed: Boolean = false)

/** Identity used for retry/dead-letter routing (reference MessageId). */
final case class MessageId(
    namespace: String,
    partition: Int,
    offset: Long,
    sourceId: String)

/**
 * An immutable, consistent cut of per-partition offsets — the reference's
 * ConsumerState (dynamic/consumer/ConsumerState.java:39-200). Offsets are
 * "last finished" (inclusive watermark); a bounded read over
 * [start, end) uses exclusive `ending` semantics like Kafka endingOffsets.
 *
 * JSON wire format matches the Kafka source's offsets JSON:
 *   {"<namespace>": {"<partition>": <offset>}}
 */
final case class ConsumerState(offsets: Map[ConsumerPartition, Long]) {
  def get(cp: ConsumerPartition): Option[Long] = offsets.get(cp)

  def withOffset(cp: ConsumerPartition, offset: Long): ConsumerState =
    ConsumerState(offsets + (cp -> offset))

  def partitionsFor(namespace: String): Seq[Int] =
    offsets.keys.collect { case ConsumerPartition(`namespace`, p) => p }.toSeq.sorted

  def toJson: String = {
    val byNs = offsets.toSeq
      .groupBy(_._1.namespace)
      .toSeq.sortBy(_._1)
    byNs.map { case (ns, parts) =>
      val inner = parts
        .sortBy(_._1.partition)
        .map { case (cp, off) => s""""${cp.partition}": $off""" }
        .mkString("{", ", ", "}")
      s""""${ConsumerState.escape(ns)}": $inner"""
    }.mkString("{", ", ", "}")
  }
}

object ConsumerState {
  val empty: ConsumerState = ConsumerState(Map.empty)

  private[graft] def escape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c    => c.toString
    }

  def fromJson(json: String): ConsumerState = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json)
    val pairs = for {
      JObject(nsFields) <- parsed
      (ns, JObject(partFields)) <- nsFields
      (p, v) <- partFields
    } yield {
      val off = v match {
        case JInt(i)     => i.toLong
        case JLong(l)    => l
        case JDouble(d)  => d.toLong
        case JString(s)  => s.toLong
        case other       => throw new IllegalArgumentException(s"bad offset: $other")
      }
      ConsumerPartition(ns, p.toInt) -> off
    }
    ConsumerState(pairs.toMap)
  }

  /** Merge taking the max offset per partition (used when combining
   * flushes from concurrent sources). */
  def merge(a: ConsumerState, b: ConsumerState): ConsumerState = {
    val keys = a.offsets.keySet ++ b.offsets.keySet
    ConsumerState(keys.map { k =>
      k -> math.max(a.offsets.getOrElse(k, Long.MinValue),
                    b.offsets.getOrElse(k, Long.MinValue))
    }.toMap)
  }
}

object LogSchema {
  /** Canonical log-record schema every LogSource must produce. Payload
   * columns beyond these are allowed (and preserved) — the engine only
   * relies on this prefix, the way the reference only relies on
   * (namespace, partition, offset) and treats Values as opaque. */
  val metaFields: Seq[StructField] = Seq(
    StructField("namespace", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true))

  val metaColumns: Seq[String] = metaFields.map(_.name)
}
