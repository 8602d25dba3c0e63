package graft.retry

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RetryPolicySuite extends SparkSuite {

  test("exponential backoff math matches reference semantics") {
    val p = ExponentialBackoffRetry(retryLimit = 25, initialDelayMs = 1000, multiplier = 2.0,
      maxDelayMs = 900000)
    assert(p.delayMs(1) === 1000L)
    assert(p.delayMs(2) === 2000L)
    assert(p.delayMs(3) === 4000L)
    assert(p.delayMs(11) === 900000L) // capped at 15 min
  }

  test("retryFurther column: limit<0 forever, 0 never, k caps") {
    import spark.implicits._
    val df = (0 to 5).toDF("fail_count")
    def kept(p: RetryPolicy): Seq[Int] =
      df.filter(p.retryFurther(col("fail_count"))).as[Int].collect().sorted.toSeq
    assert(kept(ExponentialBackoffRetry(retryLimit = -1)) === (0 to 5))
    assert(kept(NeverRetry) === Seq.empty)
    assert(kept(ExponentialBackoffRetry(retryLimit = 3)) === Seq(0, 1, 2))
    assert(kept(FailedTuplesFirstRetry) === (0 to 5))
  }

  test("routeFailures splits retryable vs permanently failed") {
    import spark.implicits._
    val failures = Seq((0L, 1), (1L, 2), (2L, 3), (3L, 4)).toDF("offset", "fail_count")
    val (retry, dead) = RetryFlow.routeFailures(failures, ExponentialBackoffRetry(retryLimit = 3))
    assert(retry.select("offset").as[Long].collect().sorted === Array(0L, 1L))
    assert(dead.select("offset").as[Long].collect().sorted === Array(2L, 3L))
  }

  test("dueRetries: schedule predicate selects only elapsed backoffs") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val table = Seq(
      (0L, 1, t0), // due at t0+1s
      (1L, 5, t0)  // due at t0+16s
    ).toDF("offset", "fail_count", "failed_at")
    val p = ExponentialBackoffRetry(initialDelayMs = 1000, multiplier = 2.0)
    val now = lit("2026-01-01 00:00:05").cast("timestamp")
    val due = RetryFlow.dueRetries(table, p, now).select("offset").as[Long].collect()
    assert(due === Array(0L))
  }
}
