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

  final case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)
  final case class NearDupHit(doc_id: Long, dup_of: Long, hamming: Int, band: Long)
  /** Per-band memory: (doc_id, simhash, event-time millis) seen within
    * the horizon. */
  final case class BandState(entries: List[(Long, Long, Long)])

  /**
   * NEAR-dup detection AT INGEST (the streaming face of
   * `dedup_simhash_pairs`): each document gets a 64-bit SimHash computed
   * per row with higher-order functions — one xxhash64 per token, zero
   * shuffle, no oracle constraint so no md5 — and is checked against the
   * documents that shared any of its 4 16-bit signature bands within the
   * event-time horizon. By the batch operator's pigeonhole argument, any
   * pair within `maxHamming` = 3 shares at least one unchanged band, so
   * banding loses nothing; state is keyed by band value and holds ONLY
   * the in-horizon members of that band — O(collisions per horizon),
   * never O(stream).
   *
   * Key-space note (r20): the batch face grew an adaptive B-block
   * ladder because its candidate mass is CORPUS-bounded and turns
   * quadratic near 2.1M docs ([[graft.operators.Dedup.simhashBlocksFor]]).
   * This face deliberately keeps the fixed 4×16 scheme: its occupancy
   * is HORIZON-bounded (in-horizon docs / 2¹⁶ per band), so the
   * quadratic-mass ceiling applies only past ~2.1M documents per
   * event-time horizon — a horizon that dense should shrink, or the
   * ingest should hand off to the batch ladder downstream.
   *
   * Contract mirrors the batch pairs operators: a pair colliding in k
   * bands emits up to k times (callers dedupe downstream), and a
   * duplicate arriving after its original left the horizon is not
   * reported — the batch dedup passes are the exactness backstop.
   *
   * State lifetime is bounded on BOTH axes: arriving rows evict
   * entries older than the event-time horizon, and a processing-time
   * TTL (`ttlMs`, default 2× the horizon) drops a band that goes QUIET —
   * without it a band's last in-horizon entries would persist for the
   * life of the query, O(distinct bands ever seen) on a months-long
   * ingest. The TTL is PROCESSING-time (keyed-state timeouts offer no
   * per-key event-time clock without a watermark), so dropping quiet
   * state is loss-free exactly when processing time tracks event time
   * within the TTL slack — the steady-ingest case. Under deeper lag
   * (a source down longer than the TTL, then replaying a backlog),
   * a quiet band's state can drop while backlogged rows inside its
   * EVENT-time horizon are still en route; those hits are missed — the
   * same bounded-state trade as horizon expiry, and the downstream
   * batch dedup passes are, as ever, the exactness backstop. Size
   * `ttlMs` to the worst outage you want to ride through. `ttlMs = 0`
   * disables the TTL — the deterministic-test mode, since a
   * processing-time timeout keeps the engine planning batches forever
   * and `processAllAvailable()` never returns (poll the sink instead —
   * see [[runningStats]]); note the TTL-on default therefore changes
   * how the query must be driven.
   */
  def dedupSimhashStream(
      spark: SparkSession,
      docs: Dataset[DocEvent],
      horizonMs: Long,
      maxHamming: Int = 3,
      ttlMs: Long = -1L): Dataset[NearDupHit] = {
    import spark.implicits._
    val bits = 64
    val bandBits = 16
    val nBands = bits / bandBits
    // signed bit-sums: +1 for a set bit of the token hash, -1 otherwise;
    // bit b of the signature is set iff its sum is >= 0 (same arithmetic
    // as the batch simhashDf, with xxhash64 for the per-token hash)
    val withSig = docs.toDF()
      .withColumn("__hs", expr("transform(split(text, ' '), t -> xxhash64(t))"))
      .withColumn("__sums", expr(
        s"""aggregate(__hs, array_repeat(0L, $bits),
           |  (acc, h) -> zip_with(acc, sequence(0L, ${bits - 1}L),
           |    (c, i) -> c + CASE WHEN (h >> CAST(i AS INT)) % 2 != 0
           |                  THEN 1L ELSE -1L END))""".stripMargin))
      .withColumn("__simhash", expr(
        s"""aggregate(zip_with(__sums, sequence(0L, ${bits - 1}L),
           |  (s, i) -> CASE WHEN s >= 0 THEN shiftleft(1L, CAST(i AS INT))
           |            ELSE 0L END), 0L, (a, x) -> a + x)""".stripMargin))
    val banded = withSig.select(col("doc_id"), col("__simhash"), col("ts"),
        explode(array((0 until nBands).map { b =>
          lit(b * 65536L) +
            shiftright(col("__simhash"), bandBits * b).bitwiseAND(lit(65535L))
        }: _*)).as("__band"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
    val resolvedTtlMs = if (ttlMs < 0) 2 * horizonMs else ttlMs
    val timeoutConf =
      if (resolvedTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(_._4)
      .flatMapGroupsWithState[BandState, NearDupHit](
        OutputMode.Append(), timeoutConf) {
        (band, rows, state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            // quiet band: everything held is past the horizon for any
            // on-time arrival — drop wholesale, emit nothing
            state.remove()
            Iterator.empty
          } else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = Seq.newBuilder[NearDupHit]
            // EVENT-TIME order within the batch (doc id tie-break for
            // determinism): eviction uses each row's own timestamp, and with
            // non-decreasing timestamps no eviction can destroy state a
            // later row is still entitled to match — processing in doc-id
            // order would let one far-future row evict an entry out from
            // under an in-horizon sibling in the same batch. Cross-batch
            // disorder is inherent lateness (same trade as any
            // watermark-bounded state).
            rows.toSeq.sortBy(r => (r._3.getTime, r._1)).foreach {
              case (docId, sig, ts, _) =>
                val t = ts.getTime
                entries = entries.filter(e => t - e._3 <= horizonMs)
                entries.foreach { case (pid, psig, _) =>
                  val ham = java.lang.Long.bitCount(sig ^ psig)
                  if (ham <= maxHamming && pid != docId)
                    out += NearDupHit(docId, pid, ham, band)
                }
                entries = (docId, sig, t) :: entries
            }
            state.update(BandState(entries))
            if (resolvedTtlMs > 0) state.setTimeoutDuration(resolvedTtlMs)
            out.result().iterator
          }
      }
  }

  final case class HHEvent(group: String, item: String)
  final case class HHSummary(group: String, counters: Map[String, Long], processed: Long)
  final case class HHEstimate(group: String, item: String, est: Long, processed: Long)

  /**
   * Streaming HEAVY HITTERS per group — the MISRA-GRIES k-counter
   * summary (Misra & Gries 1982, "Finding repeated elements") as keyed
   * state: per group at most `k` counters live; a new item with all
   * counters full decrements every counter instead (dropping zeros).
   * The deterministic guarantee — independent of arrival order and
   * partitioning, which is what makes a streaming sketch testable:
   * `true − processed/k ≤ est ≤ true`, so every item with frequency
   * above processed/k is GUARANTEED present. The streaming complement of
   * the exact batch top-k ([[graft.functions.TopKAggregator]]): the
   * batch pass downstream is the exactness backstop, the ingest sketch
   * is the bounded-state monitor (trending-item / hot-tenant alerting
   * on the firehose).
   *
   * State is O(groups × k) — never O(stream) or O(distinct items); no
   * timeout (the summary is the product; TTL composes via
   * [[runningStats]]' pattern if staleness matters). Each batch emits
   * the group's full current summary (est desc, item tiebreak), stamped
   * with `processed` so a consumer keeps the latest epoch per group.
   */
  def heavyHittersStream(
      spark: SparkSession,
      events: Dataset[HHEvent],
      k: Int): Dataset[HHEstimate] = {
    require(k > 0, "k must be positive")
    import spark.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[HHSummary, HHEstimate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (group, rows, state: GroupState[HHSummary]) =>
          var counters = state.getOption.map(_.counters)
            .getOrElse(Map.empty[String, Long])
          var processed = state.getOption.map(_.processed).getOrElse(0L)
          rows.foreach { e =>
            processed += 1
            counters.get(e.item) match {
              case Some(c) => counters += e.item -> (c + 1)
              case None if counters.size < k => counters += e.item -> 1L
              case None =>
                counters = counters.view.mapValues(_ - 1)
                  .filter(_._2 > 0).toMap
            }
          }
          state.update(HHSummary(group, counters, processed))
          counters.toSeq.sortBy { case (i, c) => (-c, i) }
            .map { case (i, c) => HHEstimate(group, i, c, processed) }
            .iterator
      }
  }

  /**
   * Watermarked stream-stream inner join (SURVEY.md §2.3 streaming
   * mapping): enrich a primary stream with a secondary stream on `key`
   * within ±`toleranceSec` of event time. Both sides carry watermarks so
   * the join state is bounded and late rows drop deterministically.
   */
  /** One definition of the tolerance-window join for both join types —
    * the interval arithmetic and watermark wiring cannot diverge. */
  private def enrichJoin(
      primary: Dataset[KeyedEvent],
      secondary: Dataset[KeyedEvent],
      watermark: String,
      toleranceSec: Int,
      joinType: String): Dataset[org.apache.spark.sql.Row] = {
    val l = primary.toDF("key", "ts", "value").withWatermark("ts", watermark)
    val r = secondary.toDF("rkey", "rts", "rvalue").withWatermark("rts", watermark)
    l.join(r,
      l("key") === r("rkey") &&
        r("rts") >= l("ts") - expr(s"INTERVAL $toleranceSec seconds") &&
        r("rts") <= l("ts") + expr(s"INTERVAL $toleranceSec seconds"),
      joinType)
  }

  def enrichWithin(
      primary: Dataset[KeyedEvent],
      secondary: Dataset[KeyedEvent],
      watermark: String,
      toleranceSec: Int): Dataset[org.apache.spark.sql.Row] =
    enrichJoin(primary, secondary, watermark, toleranceSec, "inner")

  /**
   * Watermarked stream-stream LEFT OUTER join — the enrich-or-emit-
   * anyway shape (SURVEY.md §2.13's hardest row): a primary row that
   * finds no secondary match within ±`toleranceSec` must STILL emit,
   * null-extended — but only once the watermark proves no match can
   * arrive anymore. Structured Streaming holds the unmatched left row in
   * state until `watermark` passes its join window, then emits it with
   * nulls; the suite drives exactly that lifecycle (match emits in its
   * batch; non-match emits ONLY after a later event advances the
   * watermark past the window). State stays bounded by the same
   * watermark that bounds the inner join's.
   */
  def enrichLeftOuter(
      primary: Dataset[KeyedEvent],
      secondary: Dataset[KeyedEvent],
      watermark: String,
      toleranceSec: Int): Dataset[org.apache.spark.sql.Row] =
    enrichJoin(primary, secondary, watermark, toleranceSec, "left_outer")
}
