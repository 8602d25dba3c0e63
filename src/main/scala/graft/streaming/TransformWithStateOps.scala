package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/**
 * Stateful ingest operators on Spark 4's ARBITRARY-STATE V2 API
 * (`transformWithState` + `StatefulProcessor`) — the engine's newest
 * state surface, designed for exactly the contract a year-long 100 TB
 * ingest needs: typed per-key state columns in RocksDB (changelog
 * checkpointing, no JVM-heap state), PROCESSING-TIME TTL enforced by
 * the store itself, and state schema evolution. The older faces
 * ([[StatefulOps.dedupExactStream]]'s watermark horizon,
 * `flatMapGroupsWithState`'s hand-rolled eviction) stay as the
 * event-time-exact variants; this is the operational long-haul one.
 *
 * Requires the RocksDB state store provider
 * (`spark.sql.streaming.stateStore.providerClass =
 * ...state.RocksDBStateStoreProvider`) — `transformWithState`'s own
 * requirement, not ours.
 */
object TransformWithStateOps {

  /** Emit the FIRST arrival per key, forever-until-TTL: ValueState[...]
    * keyed by `key(row)`, expiring `ttl` after each key's admission.
    * State is O(distinct keys per TTL window) — bounded on a months-long
    * ingest — and a duplicate arriving after its original's state
    * expired re-admits: the bounded-state trade every streaming dedup
    * makes, with the batch dedup passes as the exactness backstop.
    * `ttl = null` keeps state for the life of the query (exact, but
    * O(distinct keys ever) — short-lived backfills only).
    *
    * DRIVE NOTE: TTL needs `TimeMode.ProcessingTime`, and under that
    * mode the engine plans batches CONTINUOUSLY (the state clock must
    * advance), so `processAllAvailable()` never returns — poll the sink
    * (the [[StatefulOps.dedupSimhashStream]] TTL note). The `ttl=null`
    * face runs in `TimeMode.None` and drives normally. */
  def firstSeenStream[T](docs: Dataset[T], key: T => String,
      ttl: java.time.Duration)(implicit enc: Encoder[T]): Dataset[T] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(key)
      .transformWithState(new FirstSeenProcessor[T](ttl),
        if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append(), enc)
  }

  /** Exact ingest dedup on the v2 state API — the
    * [[StatefulOps.dedupExactStream]] contract with a processing-time
    * TTL instead of an event-time watermark horizon. Keying runs once
    * per ingested row: the thread-local digest
    * ([[graft.functions.GraftDigests.md5Hex]]), never a fresh
    * `MessageDigest.getInstance` per row. */
  def dedupExactStreamTTL(docs: Dataset[StatefulOps.DocEvent],
      ttl: java.time.Duration): Dataset[StatefulOps.DocEvent] = {
    val sparkS = docs.sparkSession
    import sparkS.implicits._
    firstSeenStream[StatefulOps.DocEvent](docs,
      d => graft.functions.GraftDigests.md5Hex(d.text), ttl)
  }

  /** The processor: one boolean state column per key. `handleInputRows`
    * sees ALL of a key's rows in the batch at once, so a batch emits
    * exactly one row per key even when duplicates arrive together.
    * WHICH in-batch duplicate survives is ARBITRARY (`dropDuplicates`
    * semantics): rows reach the processor in shuffle-fetch order, which
    * Spark does not fix across runs for multi-partition sources. Across
    * batches the earlier batch's survivor always wins. */
  private final class FirstSeenProcessor[T](ttl: java.time.Duration)
    extends StatefulProcessor[String, T, T] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[T],
        timers: TimerValues): Iterator[T] =
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
      }
  }
}
