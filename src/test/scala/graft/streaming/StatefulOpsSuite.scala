package graft.streaming

import graft.SparkSuite
import graft.streaming.StatefulOps.KeyedEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.sql.Timestamp

class StatefulOpsSuite extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("flatMapGroupsWithState running stats accumulate per key across batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    // timeoutMs = 0 (NoTimeout): with a processing-time timeout the
    // engine schedules batches forever and processAllAvailable never
    // returns — see StatefulOps.runningStats scaladoc
    val out = StatefulOps.runningStats(spark, input.toDS(), timeoutMs = 0)
    val q = out.writeStream.format("memory").queryName("running_stats")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    try {
      input.addData(
        KeyedEvent("a", ts("2026-01-01 00:00:00"), 1.0),
        KeyedEvent("a", ts("2026-01-01 00:00:01"), 2.0),
        KeyedEvent("b", ts("2026-01-01 00:00:02"), 10.0))
      q.processAllAvailable()
      input.addData(KeyedEvent("a", ts("2026-01-01 00:00:03"), 4.0))
      q.processAllAvailable()
      val rows = spark.table("running_stats")
        .as[StatefulOps.KeyRunningStats].collect()
      // batch 1 emits a:(2, 3.0) and b:(1, 10.0); batch 2 folds the prior
      // state forward and emits a:(3, 7.0) — state crossed the batches
      assert(rows.exists(r => r.key == "a" && r.n == 2 && r.sum == 3.0 && !r.closed))
      assert(rows.exists(r => r.key == "a" && r.n == 3 && r.sum == 7.0 && !r.closed))
      assert(rows.exists(r => r.key == "b" && r.n == 1 && r.sum == 10.0 && !r.closed))
    } finally q.stop()
  }

  test("watermarked stream-stream join enriches within the tolerance window") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prim = MemoryStream[KeyedEvent]
    val sec = MemoryStream[KeyedEvent]
    val joined = StatefulOps.enrichWithin(prim.toDS(), sec.toDS(),
      watermark = "10 seconds", toleranceSec = 5)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    try {
      prim.addData(
        KeyedEvent("k1", ts("2026-01-01 00:00:10"), 1.0),
        KeyedEvent("k2", ts("2026-01-01 00:00:10"), 2.0))
      sec.addData(
        KeyedEvent("k1", ts("2026-01-01 00:00:12"), 100.0), // within +5s
        KeyedEvent("k2", ts("2026-01-01 00:00:30"), 200.0)) // outside window
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("key", "rvalue").as[(String, Double)].collect().toSet
      assert(rows === Set(("k1", 100.0)),
        "only the within-tolerance match may join")
    } finally q.stop()
  }

  test("streaming exact dedup: first occurrence emits, in-horizon duplicates drop, state is bounded") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.md5
    val input = MemoryStream[KeyedEvent] // key stands in for document text
    val out = StatefulOps.dedupExactStream(
      input.toDS().toDF(), md5($"key".cast("binary")), "ts", horizon = "10 seconds")
    val q = out.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    try {
      // batch 1: A twice + B once → A once, B once
      input.addData(
        KeyedEvent("A", ts("2026-01-01 00:00:10"), 1.0),
        KeyedEvent("A", ts("2026-01-01 00:00:11"), 2.0),
        KeyedEvent("B", ts("2026-01-01 00:00:12"), 3.0))
      q.processAllAvailable()
      def emitted(): Seq[(String, Double)] = spark.table("stream_dedup")
        .select("key", "value").as[(String, Double)].collect().toSeq
      assert(emitted().map(_._1).sorted === Seq("A", "B"))
      assert(emitted().toSet === Set(("A", 1.0), ("B", 3.0)), "first occurrence wins")

      // batch 2: another A inside the horizon → still deduped ACROSS batches
      input.addData(KeyedEvent("A", ts("2026-01-01 00:00:13"), 4.0))
      q.processAllAvailable()
      assert(emitted().count(_._1 == "A") === 1)

      // far-future C advances the watermark past A's expiry (10 + 10s)…
      input.addData(KeyedEvent("C", ts("2026-01-01 01:00:00"), 5.0))
      q.processAllAvailable()
      // …so a NEW A re-emits: the bounded-state trade, stated in the
      // scaladoc — in-horizon memory only, never O(stream) state
      input.addData(KeyedEvent("A", ts("2026-01-01 01:00:01"), 6.0))
      q.processAllAvailable()
      assert(emitted().count(_._1 == "A") === 2,
        "state must expire with the watermark horizon (bounded-state contract)")
    } finally q.stop()
  }

  test("streaming simhash near-dup: cross-batch hits within horizon, none past it") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StatefulOps.{DocEvent, NearDupHit}
    val input = MemoryStream[DocEvent]
    // ttlMs = 0: a processing-time TTL keeps the engine planning batches
    // forever and processAllAvailable never returns — the TTL path has its
    // own sink-polling test below
    val out = StatefulOps.dedupSimhashStream(spark, input.toDS(),
      horizonMs = 60_000L, maxHamming = 3, ttlMs = 0)
    val q = out.writeStream.format("memory").queryName("stream_neardup")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    try {
      val boiler = "the quick brown fox jumps over the lazy dog again and again"
      val other = "completely unrelated legal disclaimer text mentioning nothing similar whatsoever"
      // batch 1: two identical docs (hamming 0) + one unrelated
      input.addData(
        DocEvent(1L, boiler, ts("2026-01-01 00:00:00")),
        DocEvent(2L, boiler, ts("2026-01-01 00:00:10")),
        DocEvent(3L, other, ts("2026-01-01 00:00:20")))
      q.processAllAvailable()
      def hits(): Seq[NearDupHit] =
        spark.table("stream_neardup").as[NearDupHit].collect().toSeq
      // the identical pair is found (in up to 4 bands — k-band multiplicity
      // is the batch pairs contract too); the unrelated doc matches nothing
      val pairs1 = hits().map(h => (h.dup_of, h.doc_id)).distinct
      assert(pairs1 === Seq((1L, 2L)), s"got ${hits()}")
      assert(hits().forall(_.hamming === 0))

      // batch 2: another copy inside the horizon → flagged against BOTH
      // in-horizon originals, proving state crossed the batch boundary
      input.addData(DocEvent(4L, boiler, ts("2026-01-01 00:00:30")))
      q.processAllAvailable()
      val pairs2 = hits().map(h => (h.dup_of, h.doc_id)).distinct.toSet
      assert(pairs2 === Set((1L, 2L), (1L, 4L), (2L, 4L)))

      // batch 3: a copy arriving 10 minutes later — every prior entry is
      // past the 60s horizon, so nothing is reported (bounded state, the
      // documented trade; batch dedup is the backstop)
      val before = hits().size
      input.addData(DocEvent(5L, boiler, ts("2026-01-01 00:10:30")))
      q.processAllAvailable()
      assert(hits().size === before, s"horizon-expired entries matched: ${hits()}")
    } finally q.stop()
  }

  test("streaming near-dup TTL: a quiet band's state drops after the timeout; in-horizon hits still fire") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StatefulOps.{DocEvent, NearDupHit}
    val input = MemoryStream[DocEvent]
    // TTL on ⇒ processAllAvailable() hangs (the engine plans batches
    // forever to fire pending timeouts) — poll the sink and the state
    // metrics instead, per the operator scaladoc
    val out = StatefulOps.dedupSimhashStream(spark, input.toDS(),
      horizonMs = 60_000L, maxHamming = 3, ttlMs = 1_000L)
    val q = out.writeStream.format("memory").queryName("stream_neardup_ttl")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    def hits(): Set[(Long, Long)] = spark.table("stream_neardup_ttl")
      .as[NearDupHit].collect().map(h => (h.dup_of, h.doc_id)).toSet
    def pollUntil(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30_000_000_000L
      while (!cond) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $what")
        Thread.sleep(100)
      }
    }
    try {
      val boiler = "the same boilerplate text repeated in every copy of this doc"
      // in-horizon hits fire with the TTL configured
      input.addData(
        DocEvent(1L, boiler, ts("2026-01-01 00:00:00")),
        DocEvent(2L, boiler, ts("2026-01-01 00:00:10")))
      pollUntil("the in-horizon pair (1,2)")(hits().contains((1L, 2L)))

      // go quiet past the TTL: every band's state row must be dropped —
      // observable in the state-store metrics without sending data
      pollUntil("state rows to reach 0 after the TTL") {
        Option(q.lastProgress).exists(p =>
          p.stateOperators.nonEmpty && p.stateOperators.head.numRowsTotal == 0L)
      }

      // docs 3+4: event times INSIDE doc 1/2's horizon. If the quiet
      // band had survived, (1,3)/(2,3)/… would fire; with the state
      // dropped, only the fresh (3,4) pair appears — a positive gate
      // (the new hit proves the batch ran), not a sleep-and-hope negative.
      input.addData(
        DocEvent(3L, boiler, ts("2026-01-01 00:00:20")),
        DocEvent(4L, boiler, ts("2026-01-01 00:00:30")))
      pollUntil("the fresh pair (3,4)")(hits().contains((3L, 4L)))
      val stale = hits().filter { case (a, b) => a <= 2L && b >= 3L }
      assert(stale.isEmpty,
        s"TTL-expired state matched new arrivals: $stale")
    } finally q.stop()
  }

  test("streaming near-dup: a far-future sibling in the same batch cannot destroy in-horizon hits") {
    // rows are processed in EVENT-TIME order within a batch: if a
    // far-future row ran first (the old doc-id order), its eviction pass
    // would remove state an in-horizon sibling is still entitled to match
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import StatefulOps.{DocEvent, NearDupHit}
    val input = MemoryStream[DocEvent]
    val out = StatefulOps.dedupSimhashStream(spark, input.toDS(),
      horizonMs = 60_000L, maxHamming = 3, ttlMs = 0)
    val q = out.writeStream.format("memory").queryName("stream_neardup_ooo")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    try {
      val boiler = "the same boilerplate text repeated in every copy of this doc"
      input.addData(DocEvent(1L, boiler, ts("2026-01-01 00:00:10")))
      q.processAllAvailable()
      // one batch carrying: doc 10 two minutes ahead (outside doc 1's
      // horizon) and doc 11 only 40s after doc 1 (inside it). doc 11 must
      // still be flagged against doc 1.
      input.addData(
        DocEvent(10L, boiler, ts("2026-01-01 00:02:10")),
        DocEvent(11L, boiler, ts("2026-01-01 00:00:50")))
      q.processAllAvailable()
      val pairs = spark.table("stream_neardup_ooo").as[NearDupHit]
        .collect().map(h => (h.dup_of, h.doc_id)).distinct.toSet
      assert(pairs.contains((1L, 11L)),
        s"in-horizon pair lost to a same-batch future row: $pairs")
      // and the future row itself matched nothing (everything it saw was
      // beyond ITS horizon)
      assert(!pairs.exists(_._2 == 10L), s"got $pairs")
    } finally q.stop()
  }

  test("left-outer stream-stream join: matches emit eagerly, non-matches only after the watermark closes their window") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prim = MemoryStream[KeyedEvent]
    val sec = MemoryStream[KeyedEvent]
    val joined = StatefulOps.enrichLeftOuter(prim.toDS(), sec.toDS(),
      watermark = "10 seconds", toleranceSec = 5)
    val q = joined.writeStream.format("memory").queryName("ss_left")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    def rows() = spark.table("ss_left")
      .select("key", "rvalue").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    try {
      prim.addData(
        KeyedEvent("m", ts("2026-01-01 00:00:10"), 1.0),  // will match
        KeyedEvent("n", ts("2026-01-01 00:00:10"), 2.0))  // never matches
      sec.addData(KeyedEvent("m", ts("2026-01-01 00:00:12"), 100.0))
      q.processAllAvailable()
      // the match emits eagerly; the unmatched row is HELD (its window
      // can still be matched by late secondary data)
      assert(rows() === Set(("m", Some(100.0))), rows().toString)

      // advance BOTH watermarks far past n's join window → the held row
      // must emit null-extended
      prim.addData(KeyedEvent("z", ts("2026-01-01 00:10:00"), 9.0))
      sec.addData(KeyedEvent("z2", ts("2026-01-01 00:10:00"), 9.0))
      q.processAllAvailable()
      q.processAllAvailable() // outer results surface one trigger later
      assert(rows().contains(("n", None)),
        s"unmatched primary row never emitted: ${rows()}")
    } finally q.stop()
  }

  test("streaming heavy hitters: Misra-Gries bound holds across batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StatefulOps.HHEvent]
    val k = 4
    val out = StatefulOps.heavyHittersStream(spark, input.toDS(), k)
    val q = out.writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50)).start()
    // skewed stream: "hot" dominates, a long tail of singletons
    val batch1 = Seq.fill(30)("hot") ++ Seq.fill(12)("warm") ++
      (1 to 20).map(i => s"t$i")
    val batch2 = Seq.fill(25)("hot") ++ Seq.fill(15)("warm2") ++
      (21 to 35).map(i => s"t$i")
    try {
      input.addData(batch1.map(StatefulOps.HHEvent("g", _)): _*)
      q.processAllAvailable()
      input.addData(batch2.map(StatefulOps.HHEvent("g", _)): _*)
      q.processAllAvailable()
      val rows = spark.table("hh").as[StatefulOps.HHEstimate].collect()
      val n = (batch1 ++ batch2).length.toLong
      val latest = rows.filter(_.processed == n)
      assert(latest.nonEmpty, s"no final-epoch rows in ${rows.toSeq}")
      assert(latest.length <= k)
      val exact = (batch1 ++ batch2).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      // MG guarantee: est <= true and true - est <= processed/k
      latest.foreach { e =>
        val t = exact(e.item)
        assert(e.est <= t, s"${e.item} overestimated")
        assert(t - e.est <= n / k, s"${e.item} outside the MG bound")
      }
      // every item with frequency > n/k MUST be present
      exact.filter(_._2 > n / k).keys.foreach { item =>
        assert(latest.exists(_.item == item), s"$item (freq ${exact(item)}) missing")
      }
      // state stayed bounded: no epoch ever emitted more than k rows
      rows.groupBy(_.processed).foreach { case (p, rs) =>
        assert(rs.length <= k, s"epoch $p emitted ${rs.length} > k rows")
      }
    } finally q.stop()
  }
}
