package graft.sources

import graft.model.{ConsumerPartition, ConsumerState}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/**
 * The production log source: Kafka via Spark's built-in connector — the
 * reference's Consumer (dynamic/kafka/Consumer.java:199-311) collapses to
 * source options:
 *
 *  - explicit partition assignment (no consumer-group rebalancing,
 *    KafkaConsumerConfig.java:170-174) → the `assign` option;
 *  - seek to saved offsets (Consumer.java:261-310) → `startingOffsets`
 *    JSON — [[graft.model.ConsumerState.toJson]] emits exactly that
 *    format ({"topic":{"0":off}});
 *  - offset-bounded replay (sideline windows) → batch read with
 *    `endingOffsets`;
 *  - out-of-range recovery (Consumer.java:548-590: seek earliest/latest)
 *    → `startingOffsets=earliest` + `failOnDataLoss=false`;
 *  - poll batching (300ms poll, max.poll.records, Consumer.java:483-532)
 *    → micro-batch planning + `maxOffsetsPerTrigger` / `minPartitions`;
 *  - end-offset metadata (lag gauges, Consumer.java:373-426) → one
 *    KafkaConsumer.endOffsets RPC in [[currentState]], NOT a topic scan.
 *
 * Assignment semantics: Spark's Kafka source requires a specific-offsets
 * JSON to name EVERY partition being read, so bounded reads run in
 * `assign` mode over [[resolvedPartitions]] (the explicit `partitions`
 * list, else the live partition set from one metadata RPC) and fill
 * partitions missing from a ConsumerState with the -2/-1 sentinels
 * (earliest/latest) — the LogSource contract's "missing ⇒ from the
 * beginning / to the end" (reference resume rule, Consumer.java:62-90).
 *
 * NOTE: requires spark-sql-kafka-0-10 (which bundles kafka-clients) on
 * the cluster classpath — not shipped in this container. The class
 * compiles against core APIs only (kafka-clients is reached via
 * reflection) and is exercised by unit tests at the offsets-JSON
 * boundary; the parquet-backed [[ParquetEventLog]] is the tested
 * stand-in.
 *
 * Kafka's startingOffsets are EXCLUSIVE of the committed watermark
 * position only when derived via [[startingOffsetsJson]], which adds 1 to
 * each last-finished offset (the reference resumes AFTER the watermark,
 * Consumer.java:62-90); endingOffsets are exclusive in Kafka, while
 * ConsumerState carries inclusive watermarks, so the bound adds 1 too.
 */
final case class KafkaLogSource(
    bootstrapServers: String,
    topic: String,
    partitions: Seq[Int] = Seq.empty,
    extraOptions: Map[String, String] = Map.empty) extends LogSource {

  val namespace: String = topic

  /** Spark Kafka sentinel inside specific-offsets JSON: -2 = earliest.
    * (-1 = latest exists too but is deliberately never used as a fill —
    * see [[endingOffsetsJson]].) */
  private val SentinelEarliest = -2L

  /** Kafka JSON for "start after these last-finished offsets" over the
    * given assignment; partitions absent from the state read from the
    * beginning (-2). */
  def startingOffsetsJson(state: ConsumerState, assigned: Seq[Int]): String =
    offsetsJson(state, assigned, shift = 1, sentinel = SentinelEarliest)

  /** Convenience without an assignment: named offsets only (subscribe
    * mode), or "earliest" for an empty state. */
  def startingOffsetsJson(state: ConsumerState): String =
    if (state.offsets.isEmpty) "earliest"
    else ConsumerState(state.offsets.map { case (cp, off) => cp -> (off + 1) }).toJson

  /** Kafka JSON for "stop after these last-produced offsets" (exclusive
    * bound = inclusive watermark + 1); partitions ABSENT from the state
    * read NOTHING (exclusive end 0). Missing must only ever mean
    * "unknown", never "to the live head": an ending snapshot that lacks
    * a partition (e.g. a RESOLVE stamped from committed firehose
    * progress before that partition ever committed a batch) bounds a
    * replay that must not emit rows the post-RESOLVE firehose will also
    * emit. Matches [[LogSource.readBounded]] and the reference's
    * unknown-as-exceed rule (dynamic/VirtualSpout.java:337-358,
    * doesMessageExceedEndingOffset). */
  def endingOffsetsJson(state: ConsumerState, assigned: Seq[Int]): String =
    offsetsJson(state, assigned, shift = 1, sentinel = 0L)

  def endingOffsetsJson(state: ConsumerState): String =
    ConsumerState(state.offsets.map { case (cp, off) => cp -> (off + 1) }).toJson

  private def offsetsJson(state: ConsumerState, assigned: Seq[Int],
      shift: Long, sentinel: Long): String =
    ConsumerState(assigned.map { p =>
      val cp = ConsumerPartition(topic, p)
      cp -> state.offsets.get(cp).map(_ + shift).getOrElse(sentinel)
    }.toMap).toJson

  /** The `assign` option payload: {"topic":[0,1,...]}. */
  def assignJson(assigned: Seq[Int]): String =
    s"""{"${graft.model.ConsumerState.escape(topic)}":[${assigned.sorted.mkString(",")}]}"""

  /** The partition set bounded reads run over: the explicit list when
    * configured (reference PartitionDistributor-style pinning), else the
    * live set from one metadata RPC. */
  def resolvedPartitions(): Seq[Int] =
    if (partitions.nonEmpty) partitions.sorted else KafkaMeta.partitionsOf(bootstrapServers, topic)

  /** Options shared by every read mode. `failOnDataLoss=false` is the
    * OUT-OF-RANGE RECOVERY POSTURE (reference Consumer.java:548-590
    * seeks earliest/latest instead of dying; S3 in SURVEY §2.1): a
    * saved offset that aged out of retention resets instead of failing
    * the query. `extraOptions` apply LAST, so a deployment that prefers
    * fail-fast (the reference's other matrix arm) overrides it with one
    * entry — precedence is pinned by KafkaLogSourceSuite. */
  private def commonOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "failOnDataLoss" -> "false") ++ extraOptions

  /** Full option map of [[read]] — the decision table as a testable
    * artifact (no broker in this environment, so the assembled options
    * ARE the unit-test surface; the live matrix is environment-blocked,
    * SURVEY §2.1). */
  def readOptions: Map[String, String] = commonOptions ++ Map(
    (if (partitions.nonEmpty) "assign" else "subscribe") ->
      (if (partitions.nonEmpty) assignJson(partitions) else topic),
    "startingOffsets" -> "earliest")

  /** Full option map of [[readBounded]]. */
  def boundedReadOptions(
      starting: ConsumerState,
      ending: Option[ConsumerState],
      assigned: Seq[Int]): Map[String, String] = commonOptions ++ Map(
    "assign" -> assignJson(assigned),
    "startingOffsets" -> startingOffsetsJson(starting, assigned),
    "endingOffsets" -> ending.fold("latest")(endingOffsetsJson(_, assigned)))

  /** Full option map of [[readStream]]. */
  def streamReadOptions(
      from: ConsumerState,
      assigned: Seq[Int],
      maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] = {
    val sub =
      if (assigned.nonEmpty) Map(
        "assign" -> assignJson(assigned),
        "startingOffsets" -> startingOffsetsJson(from, assigned))
      else Map(
        "subscribe" -> topic,
        "startingOffsets" -> "earliest")
    commonOptions ++ sub ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)
  }

  /** Normalize the Kafka frame to the LogSchema contract: payload stays
    * opaque in `value` exactly as the reference treats Values. */
  private def normalize(df: DataFrame): DataFrame = df.select(
    col("topic").as("namespace"),
    col("partition"),
    col("offset"),
    col("key").cast("string").as("key"),
    col("value").cast("string").as("value"),
    col("timestamp").as("ts"))

  def read(spark: SparkSession): DataFrame =
    normalize(spark.read.format("kafka").options(readOptions.asJava).load())

  override def readBounded(
      spark: SparkSession,
      starting: ConsumerState,
      ending: Option[ConsumerState]): DataFrame = {
    val assigned = resolvedPartitions()
    normalize(spark.read.format("kafka")
      .options(boundedReadOptions(starting, ending, assigned).asJava).load())
  }

  /** Partition set a resuming streaming read assigns: the LIVE partition
    * set (one metadata RPC) unioned with the state's partitions. Using
    * the state alone silently drops (a) partitions that existed but had
    * no committed offset at persist time and (b) partitions added to the
    * topic afterwards — permanent firehose data loss, since `assign`
    * mode never rebalances. State-absent members of the union start at
    * the -2 earliest sentinel via [[startingOffsetsJson]]. */
  def streamingAssignment(from: ConsumerState, live: Seq[Int]): Seq[Int] =
    (live ++ from.partitionsFor(topic)).distinct.sorted

  /** Streaming read for the firehose. `maxOffsetsPerTrigger` is the
    * admission/throttle knob (ThrottlePolicy.ratePerTrigger feeds it). */
  def readStream(spark: SparkSession, from: ConsumerState = ConsumerState.empty,
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val assigned =
      if (partitions.nonEmpty) partitions.sorted
      else if (from.offsets.nonEmpty) streamingAssignment(from, resolvedPartitions())
      else Seq.empty
    normalize(spark.readStream.format("kafka")
      .options(streamReadOptions(from, assigned, maxOffsetsPerTrigger).asJava)
      .load())
  }

  /** End offsets from ONE Kafka metadata RPC — the r1 implementation
    * inherited [[LogSource.currentState]], which computed max(offset) by
    * scanning the ENTIRE topic; every sideline START/RESOLVE paid a
    * full-history read for metadata Kafka serves directly
    * (kafka/Consumer.java:373-426 polls the same endpoint for lag).
    * Kafka end offsets are next-to-produce (exclusive); ConsumerState
    * carries inclusive last offsets, so subtract 1. Partitions that are
    * EMPTY at snapshot time stay in the state with the explicit
    * "nothing consumed" marker -1 (the +1 shift turns it into exclusive
    * end 0). Missing-from-state must only ever mean "unknown", never
    * "empty" — and endings treat unknown as read-nothing (see
    * [[endingOffsetsJson]]), so both directions are leak-free. */
  override def currentState(spark: SparkSession): ConsumerState = {
    val ids =
      if (partitions.nonEmpty) partitions
      else KafkaMeta.partitionsOf(bootstrapServers, topic)
    val ends = KafkaMeta.endOffsets(bootstrapServers, topic, ids)
    ConsumerState(ends.map {
      case (p, end) => ConsumerPartition(topic, p) -> (end - 1L)
    })
  }
}

/**
 * Kafka metadata access via reflection: kafka-clients ships with
 * spark-sql-kafka-0-10 on any deployment that can actually read this
 * source, but is absent from this build's compile classpath (zero-egress
 * container). Reflection keeps the module compiling against Spark core
 * only; on a cluster these calls bind to the real client. Fails with a
 * clear error when the client is missing.
 */
private[sources] object KafkaMeta {

  private def withConsumer[A](bootstrapServers: String)(f: (AnyRef, Class[_], Class[_]) => A): A = {
    val consumerCls =
      try Class.forName("org.apache.kafka.clients.consumer.KafkaConsumer")
      catch {
        case e: ClassNotFoundException =>
          throw new IllegalStateException(
            "kafka-clients is not on the classpath — KafkaLogSource metadata " +
              "calls (currentState/resolvedPartitions) require the Spark Kafka " +
              "connector deployment (spark-sql-kafka-0-10)", e)
      }
    val tpCls = Class.forName("org.apache.kafka.common.TopicPartition")
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    val deser = "org.apache.kafka.common.serialization.ByteArrayDeserializer"
    props.put("key.deserializer", deser)
    props.put("value.deserializer", deser)
    val consumer = consumerCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props).asInstanceOf[AnyRef]
    try f(consumer, consumerCls, tpCls)
    finally consumerCls.getMethod("close").invoke(consumer)
  }

  /** Live partition ids of a topic (one partitionsFor RPC). */
  def partitionsOf(bootstrapServers: String, topic: String): Seq[Int] =
    withConsumer(bootstrapServers) { (consumer, consumerCls, _) =>
      val infos = consumerCls.getMethod("partitionsFor", classOf[String])
        .invoke(consumer, topic).asInstanceOf[java.util.List[AnyRef]]
      infos.asScala.map { pi =>
        pi.getClass.getMethod("partition").invoke(pi)
          .asInstanceOf[java.lang.Integer].intValue
      }.toSeq.sorted
    }

  /** End offsets (exclusive, next-to-produce) for the given partitions
    * (one endOffsets RPC). */
  def endOffsets(bootstrapServers: String, topic: String,
      parts: Seq[Int]): Map[Int, Long] =
    withConsumer(bootstrapServers) { (consumer, consumerCls, tpCls) =>
      val ctor = tpCls.getConstructor(classOf[String], classOf[Int])
      val tps = parts.map(p => ctor.newInstance(topic, Int.box(p)).asInstanceOf[AnyRef])
      val ends = consumerCls.getMethod("endOffsets", classOf[java.util.Collection[_]])
        .invoke(consumer, tps.asJava)
        .asInstanceOf[java.util.Map[AnyRef, java.lang.Long]]
      ends.asScala.map { case (tp, end) =>
        val p = tpCls.getMethod("partition").invoke(tp)
          .asInstanceOf[java.lang.Integer].intValue
        p -> end.longValue
      }.toMap
    }
}
