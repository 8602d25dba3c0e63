package graft.retry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Retry / dead-letter policies — the reference's RetryManager family
 * (dynamic/retry/RetryManager.java:36-78) re-expressed as a *dataflow*:
 * instead of a driver-side TreeMap of failed MessageIds
 * (ExponentialBackoffRetryManager.java:48-309), failures live in a retry
 * TABLE with (fail_count, retry_at); each processing round unions the due
 * retries with fresh input and routes exhausted records to the dead-letter
 * sink. That is the scalable shape: state is partitioned data, not driver
 * heap, and scheduling is a predicate (`retry_at <= now`), not a timer
 * wheel. See SURVEY.md §2.6 for the mapping table.
 *
 * Policy surface mirrors the reference:
 *  - retryLimit < 0 -> retry forever (reference retryFurther:212-232)
 *  - retryLimit = 0 -> never retry (NeverRetryManager.java:35-68)
 *  - retryLimit = k -> permanently fail on the k-th failure
 *  - delay = min(initialDelayMs * multiplier^(failCount-1), maxDelayMs)
 *    (ExponentialBackoffRetryManager.failed:118-154)
 */
trait RetryPolicy extends Serializable {
  def retryLimit: Int

  /** Delay before the `failCount`-th retry attempt (failCount >= 1). */
  def delayMs(failCount: Int): Long

  /** TRUE when a record that failed `failCountCol` times may retry again. */
  def retryFurther(failCountCol: Column): Column =
    if (retryLimit < 0) lit(true)
    else failCountCol < lit(retryLimit)

  /** retry_at timestamp column: failedAt + backoff(failCount). */
  def retryAt(failedAtCol: Column, failCountCol: Column): Column
}

/** Reference default: ExponentialBackoffRetryManager (initial 1s, x2, cap
 * 15 min, limit 25 per config defaults — BASELINE.md §1). */
final case class ExponentialBackoffRetry(
    retryLimit: Int = 25,
    initialDelayMs: Long = 1000L,
    multiplier: Double = 2.0,
    maxDelayMs: Long = 900000L) extends RetryPolicy {

  def delayMs(failCount: Int): Long = {
    require(failCount >= 1)
    val d = initialDelayMs * math.pow(multiplier, (failCount - 1).toDouble)
    math.min(d, maxDelayMs.toDouble).toLong
  }

  def retryAt(failedAtCol: Column, failCountCol: Column): Column = {
    val delay = least(
      lit(initialDelayMs) * pow(lit(multiplier), failCountCol.cast("double") - 1),
      lit(maxDelayMs.toDouble))
    // timestamp + make_interval of millis, kept in codegen-friendly form
    (failedAtCol.cast("double") + delay / 1000.0).cast("timestamp")
  }
}

/** Reference FailedTuplesFirstRetryManager.java:40-100 — retry immediately,
 * before fresh input, forever. */
case object FailedTuplesFirstRetry extends RetryPolicy {
  val retryLimit: Int = -1
  def delayMs(failCount: Int): Long = 0L
  def retryAt(failedAtCol: Column, failCountCol: Column): Column = failedAtCol
}

/** Reference NeverRetryManager.java:35-68 — straight to dead-letter. */
case object NeverRetry extends RetryPolicy {
  val retryLimit: Int = 0
  def delayMs(failCount: Int): Long = Long.MaxValue
  def retryAt(failedAtCol: Column, failCountCol: Column): Column =
    lit(null).cast("timestamp")
}

/**
 * The retry dataflow itself. A retry table row is
 * (namespace, partition, offset, source_id, fail_count, failed_at, payload...)
 * — FIXTURES.md §A4.
 */
object RetryFlow {

  /** Split a batch of failures into (toRetry, permanentlyFailed) according
   * to the policy — the reference's VirtualSpout.fail routing
   * (dynamic/VirtualSpout.java:390-432) as one narrow projection. */
  def routeFailures(failures: DataFrame, policy: RetryPolicy,
      failCountCol: String = "fail_count"): (DataFrame, DataFrame) = {
    val canRetry = policy.retryFurther(col(failCountCol))
    val annotated = failures.withColumn("permanently_failed", !canRetry)
    (annotated.filter(!col("permanently_failed")),
     annotated.filter(col("permanently_failed")))
  }

  /** Retries due at `now`: the per-batch drain of the reference's
   * nextFailedMessageToRetry (ExponentialBackoffRetryManager.java:166-209). */
  def dueRetries(retryTable: DataFrame, policy: RetryPolicy, now: Column): DataFrame =
    retryTable.filter(
      policy.retryAt(col("failed_at"), col("fail_count")) <= now)
}
