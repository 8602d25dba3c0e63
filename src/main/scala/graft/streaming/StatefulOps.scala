package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom keyed-state operators on Structured Streaming — the
 * KeyValueGroupedDataset.mapGroupsWithState/flatMapGroupsWithState
 * surface (SURVEY.md §2.13: NOT required for reference parity — the
 * reference's state is control-plane only — but part of the requested
 * streaming taxonomy, and the natural home for per-tenant runtime state
 * a sidelining deployment accumulates).
 *
 * Scale notes: state lives in the state store, partitioned by key —
 * size is O(active keys), never O(rows); timeouts bound lifetime.
 */
object StatefulOps {

  final case class KeyedEvent(key: String, ts: java.sql.Timestamp, value: Double)
  final case class KeyRunningStats(key: String, n: Long, sum: Double, closed: Boolean)

  /**
   * Per-key running stats with an optional processing-time timeout: each
   * batch folds the new events into the keyed state; with `timeoutMs > 0`
   * a key going quiet for that long is emitted once as `closed = true`
   * and dropped — the flatMapGroupsWithState session/accumulator pattern.
   *
   * Note: with a timeout configured the engine keeps planning batches to
   * fire pending timeouts, so `processAllAvailable()` never returns —
   * poll the sink instead (timeouts are processing-time, inherently
   * unbounded-query territory). `timeoutMs = 0` disables timeouts
   * (pure accumulator), which is also the deterministic-test mode.
   */
  def runningStats(
      spark: SparkSession,
      events: Dataset[KeyedEvent],
      timeoutMs: Long): Dataset[KeyRunningStats] = {
    import spark.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyRunningStats, KeyRunningStats](
        OutputMode.Append(), timeoutConf) {
        (key, rows, state: GroupState[KeyRunningStats]) =>
          if (state.hasTimedOut) {
            val out = state.get.copy(closed = true)
            state.remove()
            Iterator(out)
          } else {
            val prev = state.getOption.getOrElse(KeyRunningStats(key, 0L, 0.0, closed = false))
            val it = rows.toSeq
            val next = prev.copy(
              n = prev.n + it.size,
              sum = prev.sum + it.map(_.value).sum)
            state.update(next)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator(next)
          }
      }
  }

  /**
   * Exact dedup AT INGEST (the streaming face of the batch `dedup_exact`
   * operator): emit the FIRST occurrence of each fingerprint; duplicates
   * arriving within the watermark horizon of that first occurrence are
   * dropped. State is keyed by fingerprint and bounded by the horizon —
   * O(distinct fingerprints per horizon), never O(stream) — which is the
   * only state contract that survives an unbounded 100 TB-scale ingest.
   *
   * The documented trade: a duplicate arriving AFTER its original's state
   * expired re-emits (every bounded-state streaming dedup makes it); the
   * batch dedup pass downstream (`dedup_exact` / `dedup_clusters`) is the
   * exactness backstop, the standard ingest-dedup + corpus-dedup split.
   *
   * @param docs streaming DataFrame carrying `tsCol` (event time)
   * @param fingerprint content identity, e.g. `md5(col("text"))`
   * @param horizon watermark delay bounding both lateness and the dedup
   *                memory, e.g. "10 minutes"
   */
  def dedupExactStream(
      docs: org.apache.spark.sql.DataFrame,
      fingerprint: org.apache.spark.sql.Column,
      tsCol: String,
      horizon: String): org.apache.spark.sql.DataFrame =
    docs.withColumn("__fingerprint", fingerprint)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__fingerprint")
      .drop("__fingerprint")

  /**
   * Watermarked stream-stream inner join (SURVEY.md §2.3 streaming
   * mapping): enrich a primary stream with a secondary stream on `key`
   * within ±`toleranceSec` of event time. Both sides carry watermarks so
   * the join state is bounded and late rows drop deterministically.
   */
  def enrichWithin(
      primary: Dataset[KeyedEvent],
      secondary: Dataset[KeyedEvent],
      watermark: String,
      toleranceSec: Int): Dataset[org.apache.spark.sql.Row] = {
    val l = primary.toDF("key", "ts", "value").withWatermark("ts", watermark)
    val r = secondary.toDF("rkey", "rts", "rvalue").withWatermark("rts", watermark)
    l.join(r,
      l("key") === r("rkey") &&
        r("rts") >= l("ts") - expr(s"INTERVAL $toleranceSec seconds") &&
        r("rts") <= l("ts") + expr(s"INTERVAL $toleranceSec seconds"),
      "inner")
  }
}
