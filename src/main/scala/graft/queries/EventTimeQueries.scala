package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/**
 * Event-time windowing (SURVEY.md §2.5 — ABSENT in the reference, part of
 * the requested taxonomy): tumbling, sliding, and session windows over
 * `events.ts`, plus sketch aggregation. Batch forms here (oracle-checked);
 * the streaming forms with watermarks are exercised in
 * graft.streaming.StreamingWindowSuite.
 */
object EventTimeQueries {

  /** Tumbling 1-hour windows per event type. */
  private val tumbling = QueryDef(
    (s, dir) => Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type"),
    Some("""SELECT date_trunc('hour', ts) AS window_start,
      |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
      |  event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin))

  /** Sliding windows: 2-hour duration, 1-hour slide — every event lands
    * in exactly two epoch-aligned windows. */
  private val sliding = QueryDef(
    (s, dir) => Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n"))
      .orderBy("window_start"),
    Some("""WITH shifted AS (
      |  SELECT date_trunc('hour', ts) - INTERVAL (k.k) HOUR AS window_start
      |  FROM events, (VALUES (0), (1)) AS k(k))
      |SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
      |  COUNT(*) AS n
      |FROM shifted GROUP BY window_start ORDER BY window_start""".stripMargin))

  /** Session windows per user with a 5-minute gap. The oracle reproduces
    * Spark's session semantics with the gaps-and-islands pattern (a new
    * session starts when the gap from the previous event exceeds the
    * timeout). */
  private val session = QueryDef(
    (s, dir) => Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))
      .orderBy("user_id", "session_start"),
    Some("""WITH ordered AS (
      |  SELECT user_id, ts,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                   > INTERVAL 5 MINUTE
      |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |islands AS (
      |  SELECT user_id, ts,
      |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM ordered)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n
      |FROM islands GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin))

  /** HLL sketch distinct (§2.4 extension): approx_count_distinct per
    * event type, made ORACLE-GATEABLE (r1 verdict: `no_oracle` rows are
    * ungraded): the sketch estimate itself is engine-specific, but HLL is
    * deterministic for fixed input, so the query emits the exact count
    * plus a `within_bounds` boolean (|approx−exact|/exact ≤ 3·rsd — the
    * standard error bound holds with overwhelming margin) and the oracle
    * asserts the same columns with within_bounds = TRUE. A broken sketch
    * now hash-mismatches instead of passing silently. rsd = 0.05 (the
    * r1 rsd = 0.02 doubled sketch width for no gate benefit and was the
    * main suspect in its 11.5 s bench outlier). */
  private val approxDistinct = QueryDef(
    (s, dir) => {
      val rsd = 0.05
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .withColumn("within_bounds",
          abs(col("approx_users") - col("exact_users")).cast("double") /
            col("exact_users") <= lit(3 * rsd))
        .select(col("event_type"), col("exact_users"), col("within_bounds"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS within_bounds
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "window_tumbling" -> tumbling,
    "window_sliding" -> sliding,
    "window_session" -> session,
    "window_gapfill" -> gapfill,
    "funnel_steps" -> funnelSteps,
    "cohort_retention" -> cohortRetention,
    "scd2_event_type" -> scd2EventType,
    "agg_approx_distinct" -> approxDistinct,
    "agg_hll_union" -> aggHllUnion,
    "agg_theta_sets" -> aggThetaSets,
    "agg_kll_quantiles" -> aggKllQuantiles,
    "agg_approx_topk_sketch" -> aggApproxTopkSketch,
    "agg_countmin_freq" -> aggCountminFreq)

  /** COUNT-MIN sketch point frequencies — the remaining member of the
    * sketch family (HLL = cardinality, Theta = set algebra, KLL =
    * quantiles, top-k = heavy hitters, count-min = per-item frequency):
    * one fixed-size mergeable array answers "how often did item X
    * occur" for ANY x after the fact, with the classic one-sided
    * guarantee exact ≤ est ≤ exact + ε·N (w.p. 1−δ). Built by the SQL
    * `count_min_sketch` aggregate; estimates decode on the driver via
    * Spark's own CountMinSketch reader (sketch bytes are metadata — the
    * persistable/mergeable artifact IS the point). Gate: the one-sided
    * bound itself, per probed user. */
  private lazy val aggCountminFreq = QueryDef(
    (s, dir) => {
      val eps = 0.001
      val conf = 0.99
      val ev = Tables.events(s, dir)
      val bytes = ev.selectExpr(
          s"count_min_sketch(user_id, ${eps}d, ${conf}d, 42) as sk")
        .collect()(0).getAs[Array[Byte]](0)
      val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      // N for the ε·N bound comes from the sketch itself — no second
      // table scan, and it is the exact count the sketch INGESTED
      // (a df.count() would also include null keys the sketch never saw)
      val n = sk.totalCount()
      val exact = ev.filter(col("user_id") < 5)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      import s.implicits._
      (0L until 5L).map { u =>
        val ex = exact.getOrElse(u, 0L)
        val est = sk.estimateCount(u)
        (u, ex, est >= ex && est <= ex + (eps * n).toLong + 1)
      }.toDF("user_id", "exact_cnt", "within_bounds")
        .orderBy("user_id")
    },
    Some("""WITH probe AS (
      |  SELECT CAST(unnest(range(0, 5)) AS BIGINT) AS user_id),
      |cnt AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      |  FROM events WHERE user_id < 5 GROUP BY 1)
      |SELECT p.user_id, COALESCE(c.exact_cnt, 0) AS exact_cnt,
      |  TRUE AS within_bounds
      |FROM probe p LEFT JOIN cnt c USING (user_id)
      |ORDER BY p.user_id""".stripMargin))

  /** `approx_top_k` (Spark 4) — the sketch face of heavy hitters (the
    * batch complement of the streaming Misra-Gries op): estimate the
    * token-frequency head without a full groupBy, in one mergeable
    * accumulator. Gate: every TRUE top-10 token (exact groupBy) must
    * appear in the sketch's top-10 with its estimate within 2% of the
    * exact count — sketch output itself is engine-specific, so the
    * oracle checks the exact head + the flag. */
  private lazy val aggApproxTopkSketch = QueryDef(
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val exact = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(10)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      // sketch head is 2× the gated head: estimate TIES at the cut rank
      // are broken arbitrarily, so a true-top-10 item can fall to sketch
      // rank 11 on an equal estimate — the deeper read absorbs that
      val sketch = toks.selectExpr("approx_top_k(w, 20, 1000) as tk")
        .selectExpr("explode(tk) as e").selectExpr("e.item", "e.count")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      import s.implicits._
      exact.toSeq.map { case (w, c) =>
        val ok = sketch.get(w).exists(est => math.abs(est - c).toDouble / c <= 0.02)
        (w, c, ok)
      }.toDF("token", "exact_cnt", "within_bounds")
        .orderBy(col("exact_cnt").desc, col("token"))
    },
    Some("""WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |head AS (
      |  SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      |  FROM tok WHERE len(w) > 0 GROUP BY 1
      |  ORDER BY exact_cnt DESC, token LIMIT 10)
      |SELECT token, exact_cnt, TRUE AS within_bounds
      |FROM head ORDER BY exact_cnt DESC, token""".stripMargin))

  /** THETA sketch SET ALGEBRA (DataSketches theta_* family, Spark 4) —
    * what HLL cannot do: sketches compose under INTERSECTION and
    * DIFFERENCE, so audience-overlap questions ("distinct users who
    * clicked AND purchased / clicked but never purchased") run on
    * pre-built per-segment sketch bytes instead of re-scanning events —
    * the ad-tech/growth workhorse at 100 TB. Estimates are
    * engine-specific → the [[approxDistinct]] gate: exact set counts
    * (one self-contained semi/anti distinct per operation) +
    * `within_bounds` at a 5% relative gate. */
  private lazy val aggThetaSets = QueryDef(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      // r20 opt (guide §1.2 "don't compute things twice"): the old shape
      // ran FIVE actions — intersect().count(), except().count(), an
      // intersection-estimate aggregate, a sketch collect, and the
      // difference estimate — scanning events six times and building the
      // theta sketches twice. Now: ONE pass computes both exact set
      // counts (per-user click/purchase flags, then one count aggregate —
      // set semantics identical to intersect/except incl. the NULL user
      // group), ONE pass builds both sketches, and both set-algebra
      // estimates read the two collected sketch byte arrays through the
      // binary theta_intersection/theta_difference on a 1-row local
      // frame (the sketches are set-determined, so the binary
      // intersection estimate equals the old theta_intersection_agg's).
      // At 100 TB that is 2 corpus passes instead of 6.
      val flags = ev.filter(col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(max(col("event_type") === "click").as("c"),
          max(col("event_type") === "purchase").as("p"))
      val ex = flags.agg(
        count(when(col("c") && col("p"), lit(1))).as("nboth"),
        count(when(col("c") && !col("p"), lit(1))).as("nonly"))
        .collect()(0)
      val (exactBoth, exactOnly) = (ex.getLong(0), ex.getLong(1))
      val sk = ev.filter(col("event_type").isin("click", "purchase"))
        .groupBy("event_type").agg(expr("theta_sketch_agg(user_id)").as("sk"))
      val skMap = sk.collect().map(r => r.getString(0) -> r.get(1)).toMap
      val ests = s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(
            skMap("click"), skMap("purchase"))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("a",
              org.apache.spark.sql.types.BinaryType),
            org.apache.spark.sql.types.StructField("b",
              org.apache.spark.sql.types.BinaryType))))
        .selectExpr(
          "theta_sketch_estimate(theta_intersection(a, b)) as both",
          "theta_sketch_estimate(theta_difference(a, b)) as diff")
        .collect()(0)
      val (both, diff) = (ests.getLong(0), ests.getLong(1))
      import s.implicits._
      def ok(est: Long, exact: Long) =
        if (exact == 0) est == 0
        else math.abs(est - exact).toDouble / exact <= 0.05
      Seq(
        ("click_and_purchase", exactBoth, ok(both, exactBoth)),
        ("click_not_purchase", exactOnly, ok(diff, exactOnly)))
        .toDF("op", "exact_users", "within_bounds")
        .orderBy("op")
    },
    Some("""WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT 'click_and_purchase' AS op,
      |  (SELECT COUNT(*) FROM c WHERE user_id IN (SELECT user_id FROM p))
      |    AS exact_users,
      |  TRUE AS within_bounds
      |UNION ALL
      |SELECT 'click_not_purchase' AS op,
      |  (SELECT COUNT(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p))
      |    AS exact_users,
      |  TRUE AS within_bounds
      |ORDER BY op""".stripMargin))

  /** MERGEABLE QUANTILE sketches (DataSketches KLL, Spark 4) — the
    * distributed-percentile pattern: sketch each source's token-count
    * distribution independently (ingest-time, bytes persistable), MERGE
    * the sketches, read global quantiles — no corpus re-sort, no
    * value buffering (the exact-percentile memory trap
    * `profile_documents` documents). Gate: the estimate's EXACT rank
    * must sit within KLL's rank-error bound of the target (±3% at the
    * default k=200, ~2× the published 1.33% one-sided ε). */
  private lazy val aggKllQuantiles = QueryDef(
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val merged = docs.groupBy("source")
        .agg(expr("kll_sketch_agg_bigint(n_tokens)").as("sk"))
        .agg(expr("kll_merge_agg_bigint(sk)").as("msk"))
      val qs = Seq(0.25, 0.5, 0.75, 0.9)
      val ests = merged.selectExpr(
          qs.zipWithIndex.map { case (q, i) =>
            s"kll_sketch_get_quantile_bigint(msk, cast($q as float)) as q$i"
          }: _*)
        .collect()(0)
      // r20 opt: the rank checks used to run one count() per quantile
      // plus a separate docs.count() — five corpus scans. One aggregate
      // computes every exact rank numerator and the denominator in a
      // single pass (same integers, same rank doubles, same booleans).
      val rk = docs.agg(
        count(lit(1)).as("n"),
        qs.indices.map(i =>
          count(when(col("n_tokens") <= ests.getLong(i), lit(1))).as(s"r$i")): _*)
        .collect()(0)
      val n = rk.getLong(0)
      val rows = qs.zipWithIndex.map { case (q, i) =>
        val rank = rk.getLong(i + 1).toDouble / n
        (f"p$q%.2f", math.abs(rank - q) <= 0.03)
      }
      import s.implicits._
      rows.toDF("quantile", "within_bounds").orderBy("quantile")
    },
    Some("""SELECT q AS quantile, TRUE AS within_bounds
      |FROM (VALUES ('p0.25'), ('p0.50'), ('p0.75'), ('p0.90')) AS t(q)
      |ORDER BY quantile""".stripMargin))

  /** MERGEABLE HLL sketches (DataSketches `hll_sketch_agg` /
    * `hll_union_agg`, Spark 4) — the property `approx_count_distinct`
    * does NOT give you: per-group sketches persist as BYTES and union
    * later WITHOUT re-reading data, which at 100 TB is the pre-aggregate
    * pattern (sketch per day/source at ingest, union at query time —
    * a metadata round instead of a corpus scan). The demo sketches
    * per-event-type user sets and unions them to the global count;
    * gated like [[approxDistinct]] (sketches are deterministic for
    * fixed input, estimates are engine-specific → the oracle checks
    * exact counts + a `within_bounds` flag; lgK=12 → rsd ≈ 1.6%,
    * gate at 3σ ≈ 5%). */
  private lazy val aggHllUnion = QueryDef(
    (s, dir) => {
      val per = Tables.events(s, dir)
        .groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          countDistinct(col("user_id")).as("exact_users"))
      val typed = per.select(col("event_type").as("scope"),
        col("exact_users"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("within_bounds"))
      val exactAll = Tables.events(s, dir)
        .agg(countDistinct(col("user_id")).as("exact_users"))
      val global = per.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
        .crossJoin(exactAll)
        .select(lit("__all__").as("scope"), col("exact_users"),
          (abs(col("approx") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.05).as("within_bounds"))
      typed.union(global).orderBy("scope")
    },
    Some("""SELECT event_type AS scope,
      |  COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_bounds
      |FROM events GROUP BY event_type
      |UNION ALL
      |SELECT '__all__' AS scope,
      |  COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_bounds
      |FROM events
      |ORDER BY scope""".stripMargin))

  /** SCD TYPE-2 HISTORY derivation — collapse each user's event stream
    * into validity intervals of its `event_type` state (the
    * slowly-changing-dimension table a warehouse keeps for "what was
    * the state at time T" joins, and the input shape of `join_asof`):
    * consecutive same-type events merge into one run (gaps-and-islands),
    * each run becomes a row with `valid_from` (first event), `valid_to`
    * (next run's start — NULL while current) and `is_current`.
    *
    * Ordering is total — (ts, event_id) — so run boundaries are
    * deterministic. All windows partition BY USER (parallel, bounded by
    * per-entity history); the only aggregation is one map-side-combined
    * groupBy per run. */
  private lazy val scd2EventType = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val runs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("is_start",
          (lag("event_type", 1).over(w).isNull ||
            lag("event_type", 1).over(w) =!= col("event_type")).cast("int"))
        .withColumn("run_id", sum("is_start").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val collapsed = runs.groupBy("user_id", "run_id", "event_type")
        .agg(min("ts").as("valid_from"), count(lit(1)).as("n_events"))
      // run_id rides as the tie-break: two runs of one user CAN share
      // valid_from (same-ts events of different types) and valid_from
      // alone would leave lead() and the row order engine-arbitrary
      val vw = Window.partitionBy("user_id").orderBy("valid_from", "run_id")
      collapsed
        .withColumn("valid_to", lead("valid_from", 1).over(vw))
        .withColumn("is_current", col("valid_to").isNull)
        // run_id stays in the OUTPUT too: it is the only total sort key
        // (two same-type runs of one user can share valid_from), and a
        // deterministic surrogate ordinal is what an SCD2 consumer wants
        .select("user_id", "run_id", "event_type", "valid_from", "valid_to",
          "n_events", "is_current")
        .orderBy("user_id", "run_id")
    },
    Some("""WITH ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN lag(event_type) OVER w IS NULL
      |                OR lag(event_type) OVER w <> event_type
      |              THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |runs AS (
      |  SELECT user_id, ts, event_type,
      |         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM ordered),
      |collapsed AS (
      |  SELECT user_id, run_id, event_type, MIN(ts) AS valid_from,
      |         COUNT(*) AS n_events
      |  FROM runs GROUP BY 1, 2, 3)
      |SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run_id)
      |    AS valid_to,
      |  n_events,
      |  (lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run_id)
      |    IS NULL) AS is_current
      |FROM collapsed ORDER BY user_id, run_id""".stripMargin))

  /** FUNNEL analysis — the sequential-pattern event operator: how many
    * users completed signup → (click after signup) → (purchase after
    * that click), each step's timestamp strictly after the previous
    * step's FIRST occurrence. Expressed as three map-side-combined
    * per-user min-aggregations chained by user_id joins — all three
    * frames are partitioned by the same key, so AQE plans the chain
    * without re-shuffling the later (already user-keyed, step-filtered,
    * shrinking) sides; no per-user event array ever materializes. */
  private lazy val funnelSteps = QueryDef(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(s2.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
    },
    Some("""WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
      |       (SELECT COUNT(*) FROM s2) AS n_click_after,
      |       (SELECT COUNT(*) FROM s3) AS n_purchase_after""".stripMargin))

  /** COHORT-RETENTION matrix — users grouped by first-activity week,
    * counted as retained in each subsequent week they return: the
    * standard product-analytics triangle. Cohort anchor = Monday of the
    * first event's week (`date_trunc('week')` agrees across engines);
    * offset = whole weeks between anchor and activity week. Two
    * map-side-combined aggregations (per-user first week; distinct
    * (cohort, offset, user)) — the distinct reduces map-side before the
    * count, and the cohort table joins back user-keyed. */
  private lazy val cohortRetention = QueryDef(
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohorts = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
      ev.join(cohorts, "user_id")
        .select(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"),
          col("user_id"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH ev AS (
      |  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM ev e JOIN cohorts USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin))

  /** GAP-FILL + forward-fill resampling — the time-series regularization
    * step (sparse event stream → dense per-entity daily series) that
    * feature pipelines need before any rolling computation: build the
    * full (entity × day) grid, left-join the observed daily aggregate,
    * and carry the last observation forward (`last(..., ignoreNulls)`
    * over an unbounded-preceding frame ≡ DuckDB's
    * `last_value(x IGNORE NULLS)`). Days before an entity's first
    * observation stay null; `filled` marks manufactured rows.
    *
    * Determinism: the fixture's `value` carries 2-decimal data, so a
    * ROUND(AVG, 2) lands on the exact .005 tie boundary constantly and
    * the engines' tie rules differ (observed: 88.165 → 88.16 vs 88.17).
    * The daily average is therefore computed in EXACT INTEGER CENTS
    * (sum of rounded cents, truncating integer division — the q22
    * threshold discipline) and the reported double is that integer
    * /100.0, identical IEEE division in both engines; the fill carries
    * a copy of the already-exact value.
    *
    * Shape at 100 TB: the grid is #entities × #days (metadata vs the
    * event corpus); the daily aggregate is ONE map-side-combined
    * groupBy; the fill window partitions BY ENTITY (parallel, bounded
    * by the date range) — no global sort, no unpartitioned window. */
  private lazy val gapfill = QueryDef(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir).filter(col("user_id") < 20)
      val users = ev.select("user_id").distinct()
      val grid = users.crossJoin(
        ev.sparkSession.range(1).select(explode(sequence(
          lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"),
          expr("interval 1 day"))).as("day")))
      val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg((expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .cast("double") / 100.0).as("day_avg"))
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("value_filled",
          last(col("day_avg"), ignoreNulls = true).over(
            Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("filled",
          col("day_avg").isNull && col("value_filled").isNotNull)
        .select("user_id", "day", "day_avg", "value_filled", "filled")
        .orderBy("user_id", "day")
    },
    Some("""WITH u AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id < 20),
      |d AS (
      |  SELECT CAST(unnest(generate_series(DATE '2024-01-01',
      |    DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day),
      |grid AS (SELECT user_id, day FROM u, d),
      |daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) // COUNT(*) AS DOUBLE)
      |           / 100.0 AS day_avg
      |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
      |f AS (
      |  SELECT g.user_id, g.day, daily.day_avg,
      |         last_value(daily.day_avg IGNORE NULLS) OVER (
      |           PARTITION BY g.user_id ORDER BY g.day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
      |  FROM grid g LEFT JOIN daily
      |    ON daily.user_id = g.user_id AND daily.day = g.day)
      |SELECT user_id, day, day_avg, value_filled,
      |  (day_avg IS NULL AND value_filled IS NOT NULL) AS filled
      |FROM f ORDER BY user_id, day""".stripMargin))
}
