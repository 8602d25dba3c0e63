package graft.streaming

import graft.SparkSuite
import graft.retry.{ExponentialBackoffRetry, FailedTuplesFirstRetry}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class RetryingFlowSuite extends SparkSuite {

  test("retry dataflow: backoff, retries-first, dead-letter after limit") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-retry").toString
    val store = new RetryingFlow.RetryStore(spark, dir)
    // value % 3 == 0 fails until its 2nd attempt; value % 5 == 0 fails
    // forever (hits the limit and dead-letters). 15 fails both ways ->
    // dead-letters (5-rule keeps failing it).
    val isFailure = (col("value") % 5 === 0) ||
      (col("value") % 3 === 0 && col("fail_count") < 1)
    val policy = ExponentialBackoffRetry(retryLimit = 3,
      initialDelayMs = 0, multiplier = 1.0, maxDelayMs = 0)

    // batch 1: values 1..10
    val b1 = (1 to 10).toDF("value")
    val (s1, d1) = RetryingFlow.processBatchTransient(spark, store, b1, policy, isFailure)
    // 3,6,9 fail (first attempt), 5,10 fail (forever-rule): all retryable
    assert(s1.select("value").as[Int].collect().sorted === Seq(1, 2, 4, 7, 8))
    assert(d1.count() === 0)

    // batch 2: empty fresh input; due retries flow back in first
    val b2 = spark.emptyDataset[Int].toDF("value")
    val (s2, d2) = RetryingFlow.processBatchTransient(spark, store, b2, policy, isFailure)
    // 3,6,9 now have fail_count=1 -> succeed; 5,10 fail again (count=2)
    assert(s2.select("value").as[Int].collect().sorted === Seq(3, 6, 9))
    assert(d2.count() === 0)

    // two more rounds: 5,10 reach the retry limit (3) and dead-letter
    val (s3, d3) = RetryingFlow.processBatchTransient(spark, store, b2, policy, isFailure)
    assert(s3.count() === 0 && d3.count() === 0)
    val (s4, d4) = RetryingFlow.processBatchTransient(spark, store, b2, policy, isFailure)
    assert(s4.count() === 0)
    assert(d4.select("value").as[Int].collect().sorted === Seq(5, 10))
    assert(d4.filter(col("permanently_failed")).count() === 2)

    // retry table drained
    val (s5, d5) = RetryingFlow.processBatchTransient(spark, store, b2, policy, isFailure)
    assert(s5.count() === 0 && d5.count() === 0)
  }

  test("success path is never collected to the driver (plan inspection)") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-retry3").toString
    val store = new RetryingFlow.RetryStore(spark, dir)
    val policy = ExponentialBackoffRetry(retryLimit = 3,
      initialDelayMs = 0, multiplier = 1.0, maxDelayMs = 0)
    val (s, d) = RetryingFlow.processBatchTransient(spark, store,
      (1 to 100).toDF("value"), policy, isFailure = col("value") % 2 === 0)
    // a driver-side collect would surface as a LocalRelation/LocalTableScan;
    // localCheckpoint keeps the rows on the executors as an RDD scan
    for (df <- Seq(s, d)) {
      val logical = df.queryExecution.logical.toString
      assert(!logical.contains("LocalRelation"), logical)
      assert(logical.contains("LogicalRDD"), logical)
    }
    assert(s.count() === 50)
  }

  test("backoff schedule defers retries that are not yet due") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-retry2").toString
    val store = new RetryingFlow.RetryStore(spark, dir)
    val policy = ExponentialBackoffRetry(retryLimit = -1,
      initialDelayMs = 3600L * 1000, multiplier = 2.0, maxDelayMs = 7200L * 1000)
    val isFailure = col("value") % 2 === 0

    val t0 = lit("2026-01-01 00:00:00").cast("timestamp")
    val (s1, _) = RetryingFlow.processBatchTransient(spark, store,
      (1 to 4).toDF("value"), policy, isFailure, now = t0)
    assert(s1.select("value").as[Int].collect().sorted === Seq(1, 3))

    // 1 second later: backoff (1h) not elapsed -> nothing re-enters
    val later = lit("2026-01-01 00:00:01").cast("timestamp")
    val empty = spark.emptyDataset[Int].toDF("value")
    val (s2, d2) = RetryingFlow.processBatchTransient(spark, store, empty, policy,
      // without retries the failure predicate sees nothing
      isFailure, now = later)
    assert(s2.count() === 0 && d2.count() === 0)
    // the retry table still holds both rows for the future
    assert(store.read().get.count() === 2)

    // 2 hours later: due; they fail again and reschedule with 2h backoff
    val muchLater = lit("2026-01-01 02:00:00").cast("timestamp")
    val (s3, _) = RetryingFlow.processBatchTransient(spark, store, empty, policy,
      isFailure, now = muchLater)
    assert(s3.count() === 0)
    val table = store.read().get
    assert(table.count() === 2)
    assert(table.filter(col("fail_count") === 2).count() === 2)
  }

  test("crash between sink write and table commit replays due retries (at-least-once)") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-retry-order").toString
    val store = new RetryingFlow.RetryStore(spark, dir)
    val policy = ExponentialBackoffRetry(retryLimit = 3,
      initialDelayMs = 0, multiplier = 1.0, maxDelayMs = 0)
    // value 2 fails on its first attempt only
    val isFailure = col("value") % 2 === 0 && col("fail_count") < 1

    // batch 1: 2 is scheduled for retry
    RetryingFlow.processBatchTransient(spark, store, (1 to 3).toDF("value"), policy, isFailure)
    assert(store.read().get.select("value").as[Int].collect() === Seq(2))

    // batch 2 CRASHES mid-sink: the due retry (2) was pulled from the
    // table and would have succeeded, but the process dies before the
    // sink write completes. The retry table must still contain 2 — the
    // old reverse ordering committed the drained table first, making the
    // due retry unrecoverable (gone from state, never written to output).
    val empty = spark.emptyDataset[Int].toDF("value")
    val emitted = scala.collection.mutable.Buffer.empty[Int]
    intercept[RuntimeException] {
      RetryingFlow.processBatch(spark, store, empty, policy, isFailure,
        sinks = (_, _) => throw new RuntimeException("sink crashed"))
    }
    val postCrash = new RetryingFlow.RetryStore(spark, dir) // fresh handle = restart
    assert(postCrash.read().get.select("value").as[Int].collect() === Seq(2))

    // the streaming engine replays the batch; this time the sinks land
    // and the retry is emitted — at-least-once, never silently dropped
    RetryingFlow.processBatch(spark, postCrash, empty, policy, isFailure,
      sinks = (ok, _) => emitted ++= ok.select("value").as[Int].collect())
    assert(emitted.toSeq === Seq(2))
    assert(postCrash.read().get.count() === 0) // table drained and committed
  }

  test("store replace is invisible to a concurrent reader (no empty-table window)") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-retry-txn").toString
    val store = new RetryingFlow.RetryStore(spark, dir)
    store.replace((1 to 5).toDF("value"))

    // a reader plans against the CURRENT version...
    val inFlight = store.read().get
    // ...and a writer replaces the table underneath it. The r2 two-move
    // swap had a window where the table directory was absent; with the
    // manifest store the reader's version stays on disk (GC keeps one
    // previous generation) and evaluates completely.
    store.replace((10 to 12).toDF("value"))
    assert(inFlight.select("value").as[Int].collect().sorted === Seq(1, 2, 3, 4, 5))
    // a fresh read sees the new committed version
    assert(store.read().get.select("value").as[Int].collect().sorted === Seq(10, 11, 12))
  }

  test("store crash between version write and commit loses nothing") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-retry-crash").toString
    val store = new RetryingFlow.RetryStore(spark, dir)
    store.replace((1 to 3).toDF("value"))

    // simulate a crash AFTER the new version's parquet is fully written
    // but BEFORE the manifest commit: readers (including a post-restart
    // store over the same dir) must still see the old complete table,
    // never an empty or missing one
    val orphan = store.writeVersion((100 to 200).toDF("value"))
    val restarted = new RetryingFlow.RetryStore(spark, dir)
    assert(restarted.read().get.select("value").as[Int].collect().sorted === Seq(1, 2, 3))

    // the interrupted replace simply reruns: the next version number is
    // still current+1, so the rerun OVERWRITES the orphan directory and
    // commits it — the uncommitted content can never resurface
    restarted.replace((7 to 9).toDF("value"))
    assert(restarted.read().get.select("value").as[Int].collect().sorted === Seq(7, 8, 9))
    val names = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString).toSet
    assert(names.contains(orphan) && Files.readString(
      java.nio.file.Paths.get(dir, "MANIFEST")).trim === orphan)

    // version dirs stay bounded to current + previous generation
    assert(names.count(_.startsWith("v")) <= 2)
  }
}
