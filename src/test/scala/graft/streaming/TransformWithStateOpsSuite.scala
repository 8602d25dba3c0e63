package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.sql.Timestamp

/** The arbitrary-state-v2 ingest dedup: first-arrival semantics across
  * batches on RocksDB-backed TTL'd ValueState. */
class TransformWithStateOpsSuite extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def withRocksDB[A](f: => A): A = {
    val k = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("first arrival per fingerprint across batches; in-batch duplicates collapse") {
    withRocksDB {
      val sparkS = spark
      import sparkS.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import StatefulOps.DocEvent
      val input = MemoryStream[DocEvent]
      val out = TransformWithStateOps.dedupExactStreamTTL(
        input.toDS(), ttl = null)
      val q = out.writeStream.format("memory").queryName("tws_dedup")
        .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50))
        .start()
      try {
        def got(): Seq[Long] =
          spark.table("tws_dedup").as[DocEvent].collect().map(_.doc_id).sorted.toSeq
        // batch 1: A, A, B — exactly one A survives. WHICH one is
        // arbitrary by contract (dropDuplicates semantics); the pinned
        // ids here are stable only because MemoryStream stages a single
        // upstream partition, so assert the collapse, not the survivor
        input.addData(
          DocEvent(1L, "alpha", ts("2026-01-01 00:00:00")),
          DocEvent(2L, "alpha", ts("2026-01-01 00:00:01")),
          DocEvent(3L, "beta", ts("2026-01-01 00:00:02")))
        q.processAllAvailable()
        assert(got().length === 2 && got().intersect(Seq(1L, 2L)).length === 1
            && got().contains(3L), s"got ${got()}")
        // batch 2: A again (cross-batch state) + C (new) — the earlier
        // batch's survivor always wins across batches
        input.addData(
          DocEvent(4L, "alpha", ts("2026-01-01 00:01:00")),
          DocEvent(5L, "gamma", ts("2026-01-01 00:01:01")))
        q.processAllAvailable()
        assert(got().length === 3 && !got().contains(4L) && got().contains(5L),
          s"cross-batch duplicate leaked or a new key was dropped: ${got()}")
      } finally q.stop()
    }
  }

  test("TTL'd state re-admits a duplicate after expiry — the bounded-state trade, observed") {
    withRocksDB {
      val sparkS = spark
      import sparkS.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import StatefulOps.DocEvent
      val input = MemoryStream[DocEvent]
      val out = TransformWithStateOps.dedupExactStreamTTL(
        input.toDS(), ttl = java.time.Duration.ofSeconds(5))
      val q = out.writeStream.format("memory").queryName("tws_dedup_ttl")
        .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(50))
        .start()
      try {
        // ProcessingTime mode plans batches continuously —
        // processAllAvailable() never returns; POLL the sink instead
        def n(): Int = spark.table("tws_dedup_ttl").count().toInt
        def await(want: Int, what: String): Unit = {
          val deadline = System.nanoTime() + 30L * 1000000000L
          while (n() < want && System.nanoTime() < deadline) Thread.sleep(50)
          assert(n() === want, s"$what (rows=${n()})")
        }
        input.addData(DocEvent(1L, "alpha", ts("2026-01-01 00:00:00")))
        await(1, "first arrival not emitted")
        // inside the TTL: suppressed (settle, then re-check)
        input.addData(DocEvent(2L, "alpha", ts("2026-01-01 00:00:01")))
        Thread.sleep(1500)
        assert(n() === 1, "duplicate inside the TTL leaked")
        // past the TTL: state expired, the duplicate re-admits
        Thread.sleep(6000)
        input.addData(DocEvent(3L, "alpha", ts("2026-01-01 00:00:02")))
        await(2, "expired state did not re-admit (TTL not enforced?)")
      } finally q.stop()
    }
  }
}
