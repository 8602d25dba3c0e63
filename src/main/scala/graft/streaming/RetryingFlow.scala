package graft.streaming

import graft.retry.RetryPolicy
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/**
 * The retry/dead-letter dataflow (SURVEY.md §2.6) wired into a micro-batch
 * pipeline: the reference's per-record ack/fail/retry loop
 * (dynamic/VirtualSpout.java:390-432 + ExponentialBackoffRetryManager)
 * becomes a durable retry TABLE folded into each batch.
 *
 * Per batch:
 *   1. fresh input rows enter with fail_count = 0;
 *   2. due retries (retry_at <= now) from the retry table are unioned in
 *      FIRST (FailedTuplesFirstRetryManager ordering is the union order);
 *   3. the caller's `isFailure` predicate marks rows that failed
 *      processing;
 *   4. failures split by policy.retryFurther: retryable rows go back to
 *      the retry table with fail_count+1 and retry_at = backoff schedule;
 *      exhausted rows route to the dead-letter sink with
 *      permanently_failed = true (reference R5: emit on "failed" stream);
 *   5. successes emit to the main sink.
 *
 * The retry table here is an overwrite-per-batch parquet directory — the
 * state is retries only (small by construction); on a cluster the same
 * flow writes a Delta/iceberg table for transactional rewrites. The
 * directory layout is swapped behind [[RetryStore]].
 */
object RetryingFlow {

  /** Durable store for the retry table. */
  final class RetryStore(spark: SparkSession, dir: String) {
    private val live = Paths.get(dir, "live")
    private val staging = Paths.get(dir, "staging")

    def read(): Option[DataFrame] =
      if (Files.exists(live)) Some(spark.read.parquet(live.toString)) else None

    /** Atomic-enough replace for a filesystem table: write staging, swap
      * directories. (Delta at scale — this is the plug point.) */
    def replace(df: DataFrame): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      val tmp = Paths.get(dir, s".old-${System.nanoTime()}")
      if (Files.exists(live)) Files.move(live, tmp)
      Files.move(staging, live)
      if (Files.exists(tmp)) {
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
  }

  /**
   * Process one micro-batch through the retry dataflow.
   *
   * @param batch fresh rows (any schema S)
   * @param isFailure marks rows (over S + fail_count) that failed this round
   * @param now processing-time column for schedule evaluation
   * @return (successes (S + fail_count), deadLetters (S + fail_count +
   *         permanently_failed)); the retry table is updated as a side
   *         effect
   */
  def processBatch(
      spark: SparkSession,
      store: RetryStore,
      batch: DataFrame,
      policy: RetryPolicy,
      isFailure: org.apache.spark.sql.Column,
      now: org.apache.spark.sql.Column = current_timestamp())
      : (DataFrame, DataFrame) = {

    val fresh = batch
      .withColumn("fail_count", lit(0))
      .withColumn("failed_at", lit(null).cast("timestamp"))

    val retryTable = store.read()
    val due = retryTable.map(_.filter(
      policy.retryAt(col("failed_at"), col("fail_count")) <= now))
    val notDue = retryTable.map(_.filter(
      policy.retryAt(col("failed_at"), col("fail_count")) > now))

    // retries first (reference FailedTuplesFirstRetryManager.java:40-100)
    val input = due.fold(fresh)(d => d.unionByName(fresh)).persist()
    try {
      val failed = input.filter(isFailure)
        .withColumn("fail_count", col("fail_count") + 1)
        .withColumn("failed_at", now.cast("timestamp"))
      val successes = input.filter(!isFailure).drop("failed_at")

      val canRetry = policy.retryFurther(col("fail_count") - 1)
      val toRetry = failed.filter(canRetry)
      val dead = failed.filter(!canRetry)
        .withColumn("permanently_failed", lit(true))
        .drop("failed_at")

      // Cut lineage BEFORE rewriting the table the outputs derive from —
      // the due-retry rows were read from the live directory that
      // store.replace() is about to swap. localCheckpoint materializes the
      // partitions on the EXECUTORS (eager), so unlike the r1 collect()
      // this never funnels a whole micro-batch through driver memory.
      // Caveat (documented trade): locally-checkpointed blocks die with
      // their executor; the outputs are micro-batch-transient and the
      // surrounding foreachBatch replays the batch on failure, so recovery
      // is the streaming engine's, not this table's.
      val deadOut = dead.localCheckpoint(true)
      val successOut = successes.localCheckpoint(true)
      val newTable = notDue.fold(toRetry)(nd => nd.unionByName(toRetry))
      store.replace(newTable)
      (successOut, deadOut)
    } finally { input.unpersist(); () }
  }
}
