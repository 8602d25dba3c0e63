package graft.sources

import graft.model.{ConsumerPartition, ConsumerState}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
 *    → micro-batch planning + `maxOffsetsPerTrigger` / `minPartitions`.
 *
 * NOTE: requires spark-sql-kafka-0-10 on the cluster classpath (not
 * shipped in this container — the class compiles against core APIs only
 * and is exercised by unit tests at the offsets-JSON boundary; the
 * parquet-backed [[ParquetEventLog]] is the tested stand-in).
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
    extraOptions: Map[String, String] = Map.empty) extends LogSource {

  val namespace: String = topic

  /** Kafka JSON for "start after these last-finished offsets". */
  def startingOffsetsJson(state: ConsumerState): String =
    if (state.offsets.isEmpty) "earliest"
    else ConsumerState(state.offsets.map { case (cp, off) => cp -> (off + 1) }).toJson

  /** Kafka JSON for "stop after these last-produced offsets" (exclusive
    * bound = inclusive watermark + 1). */
  def endingOffsetsJson(state: ConsumerState): String =
    ConsumerState(state.offsets.map { case (cp, off) => cp -> (off + 1) }).toJson

  private def base(r: org.apache.spark.sql.DataFrameReader) = r
    .format("kafka")
    .option("kafka.bootstrap.servers", bootstrapServers)
    .option("subscribe", topic)
    .option("failOnDataLoss", "false")
    .options(extraOptions)

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
    normalize(base(spark.read)
      .option("startingOffsets", "earliest")
      .load())

  override def readBounded(
      spark: SparkSession,
      starting: ConsumerState,
      ending: Option[ConsumerState]): DataFrame = {
    val r = base(spark.read)
      .option("startingOffsets", startingOffsetsJson(starting))
    normalize(ending.fold(r.option("endingOffsets", "latest"))(e =>
      r.option("endingOffsets", endingOffsetsJson(e))).load())
  }

  /** Streaming read for the firehose. `maxOffsetsPerTrigger` is the
    * admission/throttle knob (ThrottlePolicy.ratePerTrigger feeds it). */
  def readStream(spark: SparkSession, from: ConsumerState = ConsumerState.empty,
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val sr = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("failOnDataLoss", "false")
      .option("startingOffsets", startingOffsetsJson(from))
      .options(extraOptions)
    normalize(maxOffsetsPerTrigger
      .fold(sr)(n => sr.option("maxOffsetsPerTrigger", n.toString))
      .load())
  }
}
