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
    "agg_approx_distinct" -> approxDistinct)
}
