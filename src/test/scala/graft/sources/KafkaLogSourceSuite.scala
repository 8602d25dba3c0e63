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

  test("endingOffsets JSON converts inclusive watermarks to exclusive bounds, missing => read nothing") {
    // A partition ABSENT from an ending state is UNKNOWN, not "to the
    // live head": filling with the -1 latest sentinel would replay a
    // never-committed partition up to the head — rows produced after a
    // RESOLVE would be emitted by the chain-free firehose AND returned
    // by the replay (double emit). Exclusive end 0 = read nothing,
    // matching LogSource.readBounded's unknown-as-exceed.
    val json = src.endingOffsetsJson(st(1 -> 99L), Seq(0, 1, 2))
    assert(json === """{"events": {"0": 0, "1": 100, "2": 0}}""")
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

  test("streaming resume assigns the UNION of live and state partitions") {
    // A state persisted when only partitions {0,2} had committed offsets
    // must not confine the resumed stream to {0,2}: partition 1 (live,
    // no offset yet) and partition 3 (added after persist) would be
    // silently never consumed — permanent data loss in assign mode.
    val unpinned = KafkaLogSource("broker:9092", "events")
    val state = st(0 -> 41L, 2 -> 7L)
    val assigned = unpinned.streamingAssignment(state, live = Seq(0, 1, 2, 3))
    assert(assigned === Seq(0, 1, 2, 3))
    // state-absent partitions start from the beginning, not latest
    assert(unpinned.startingOffsetsJson(state, assigned) ===
      """{"events": {"0": 42, "1": -2, "2": 8, "3": -2}}""")
    // a state partition no longer in live metadata is still drained
    assert(unpinned.streamingAssignment(state, live = Seq(0, 1)) === Seq(0, 1, 2))
  }

  test("empty-at-snapshot partition carries -1 (nothing consumed), bounding replay to end 0") {
    // currentState keeps empty partitions with the explicit marker -1;
    // as a RESOLVE ending snapshot the +1 shift yields exclusive end 0
    // (read nothing) — NOT the -1 latest sentinel, which would leak
    // post-RESOLVE rows into the replay and double-emit them.
    val json = src.endingOffsetsJson(st(0 -> 99L, 1 -> -1L), Seq(0, 1, 2))
    assert(json === """{"events": {"0": 100, "1": 0, "2": 0}}""")
    // and as a starting state, -1 resumes from offset 0 (the beginning)
    assert(src.startingOffsetsJson(st(1 -> -1L), Seq(1)) ===
      """{"events": {"1": 0}}""")
  }

  test("offsets JSON round-trips through ConsumerState.fromJson") {
    val s = st(0 -> 5L, 1 -> 10L)
    assert(ConsumerState.fromJson(s.toJson) === s)
  }

  // ---- reset-matrix decision table (reference ConsumerTest.java:1856-2430
  // runs it against embedded brokers; no broker here, so the assembled
  // option maps — what the connector actually receives — are the pinned
  // surface; Consumer.java:548-590 is the seek-earliest/latest recovery
  // this maps onto) ----

  test("every read mode carries the out-of-range recovery posture (failOnDataLoss=false)") {
    assert(src.readOptions("failOnDataLoss") === "false")
    assert(src.boundedReadOptions(st(0 -> 1L), None, Seq(0, 1, 2))("failOnDataLoss") === "false")
    assert(src.streamReadOptions(st(0 -> 1L), Seq(0, 1, 2))("failOnDataLoss") === "false")
    // aged-out saved offsets reset instead of failing the query — the
    // reference's FailInvalidOffsetPositions=false arm; the fail-fast arm
    // is one extraOptions entry (tested below)
  }

  test("extraOptions override the recovery posture (the matrix's fail-fast arm) but never the mode options") {
    val failFast = KafkaLogSource("broker:9092", "events", partitions = Seq(0),
      extraOptions = Map("failOnDataLoss" -> "true", "startingOffsets" -> "latest"))
    assert(failFast.readOptions("failOnDataLoss") === "true")
    // mode-derived options are authoritative: a stray startingOffsets in
    // extraOptions cannot silently defeat the resume-after-watermark JSON
    assert(failFast.boundedReadOptions(st(0 -> 41L), None, Seq(0))("startingOffsets") ===
      """{"events": {"0": 42}}""")
    assert(failFast.readOptions("startingOffsets") === "earliest")
  }

  test("bounded read option map: assign + resume-after-watermark + exclusive endings") {
    val opts = src.boundedReadOptions(
      st(0 -> 41L, 2 -> 7L), Some(st(0 -> 99L)), Seq(0, 1, 2))
    assert(opts("assign") === """{"events":[0,1,2]}""")
    assert(opts("startingOffsets") === """{"events": {"0": 42, "1": -2, "2": 8}}""")
    assert(opts("endingOffsets") === """{"events": {"0": 100, "1": 0, "2": 0}}""")
    assert(!opts.contains("subscribe"))
    // no ending bound => drain to the live head
    assert(src.boundedReadOptions(st(0 -> 1L), None, Seq(0))("endingOffsets") === "latest")
  }

  test("stream read option map: assign mode with state, subscribe mode without") {
    val withState = src.streamReadOptions(st(0 -> 41L), Seq(0, 1, 2),
      maxOffsetsPerTrigger = Some(500L))
    assert(withState("assign") === """{"events":[0,1,2]}""")
    assert(withState("startingOffsets") === """{"events": {"0": 42, "1": -2, "2": -2}}""")
    assert(withState("maxOffsetsPerTrigger") === "500")
    assert(!withState.contains("subscribe"))

    val fresh = src.streamReadOptions(ConsumerState.empty, Seq.empty)
    assert(fresh("subscribe") === "events")
    assert(fresh("startingOffsets") === "earliest")
    assert(!fresh.contains("assign") && !fresh.contains("maxOffsetsPerTrigger"))
  }
}
