package graft.sources

import graft.model.{ConsumerPartition, ConsumerState}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Offsets-JSON boundary tests for the Kafka source (no broker in this
 * container — these pin the exact option payloads Spark's Kafka
 * connector receives, which is where the reference's assign/seek
 * semantics live).
 */
class KafkaLogSourceSuite extends AnyFunSuite {

  private val src = KafkaLogSource("broker:9092", "events", partitions = Seq(0, 1, 2))

  private def st(pairs: (Int, Long)*): ConsumerState =
    ConsumerState(pairs.map { case (p, o) => ConsumerPartition("events", p) -> o }.toMap)

  test("assign JSON lists the pinned partitions") {
    assert(src.assignJson(Seq(2, 0, 1)) === """{"events":[0,1,2]}""")
  }

  test("startingOffsets JSON names EVERY assigned partition, resuming after the watermark") {
    // partitions missing from the state fill with -2 (earliest) — the
    // LogSource contract's "missing => from the beginning"; known
    // partitions resume at watermark+1 (reference Consumer.java:62-90)
    val json = src.startingOffsetsJson(st(0 -> 41L, 2 -> 7L), Seq(0, 1, 2))
    assert(json === """{"events": {"0": 42, "1": -2, "2": 8}}""")
  }

  test("endingOffsets JSON converts inclusive watermarks to exclusive bounds, missing => latest") {
    val json = src.endingOffsetsJson(st(1 -> 99L), Seq(0, 1, 2))
    assert(json === """{"events": {"0": -1, "1": 100, "2": -1}}""")
  }

  test("subscribe-mode starting offsets: earliest for an empty state") {
    assert(src.startingOffsetsJson(ConsumerState.empty) === "earliest")
  }

  test("currentState fails with a clear error when kafka-clients is absent") {
    val e = intercept[IllegalStateException] {
      KafkaMeta.partitionsOf("broker:9092", "events")
    }
    assert(e.getMessage.contains("kafka-clients"))
  }

  test("offsets JSON round-trips through ConsumerState.fromJson") {
    val s = st(0 -> 5L, 1 -> 10L)
    assert(ConsumerState.fromJson(s.toJson) === s)
  }
}
