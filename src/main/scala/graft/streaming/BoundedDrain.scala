package graft.streaming

import graft.model.{ConsumerPartition, ConsumerState}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.util.concurrent.ConcurrentHashMap

/**
 * Self-completing bounded drain of a stream — the reference's sideline
 * completion path: VirtualSpout.attemptToComplete
 * (dynamic/VirtualSpout.java:554-614: when every assigned partition has
 * reached its ending offset the spout stops itself) plus the completion
 * hook (SidelineVirtualSpoutHandler.onVirtualSpoutCompletion:73-92 —
 * cleanup, idempotent).
 *
 * After RESOLVE stamps the ending state, attach this to the RESUME
 * stream: rows past the bound are excluded from emission but their
 * offsets still advance the observed high-watermark, and once every
 * bounded partition's watermark passes its ending offset the query stops
 * itself (from a separate thread — a query cannot stop inside its own
 * batch) and fires `onComplete` exactly once.
 */
object BoundedDrain {

  def run(
      stream: DataFrame,
      ending: ConsumerState,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(100),
      queryName: String = "graft-bounded-drain",
      onComplete: () => Unit = () => ()): StreamingQuery = {

    require(ending.offsets.nonEmpty, "bounded drain needs a non-empty ending state")
    val seen = new ConcurrentHashMap[Int, Long]()
    // started counts down once queryRef is assigned; the completer thread
    // awaits it so a first micro-batch that already satisfies the bound
    // (before writeStream.start() returns) cannot observe a null queryRef
    val started = new java.util.concurrent.CountDownLatch(1)
    @volatile var queryRef: StreamingQuery = null
    @volatile var completed = false

    val boundExpr = ending.offsets.map { case (ConsumerPartition(_, p), off) =>
      (col("partition") === p) && (col("offset") <= off)
    }.reduceLeft(_ || _)

    val q = stream.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        try {
          // emit only rows inside the bound (F7 ending-offset check)
          sink(cached.filter(boundExpr), batchId)
          // advance observed watermarks from ALL rows, incl. beyond-bound
          cached.groupBy(col("partition")).agg(max(col("offset")).as("m"))
            .collect().foreach { r =>
              seen.merge(r.getInt(0), r.getLong(1), (a, b) => math.max(a, b))
            }
        } finally { cached.unpersist(); () }
        // complete when every bounded partition has been seen past its end
        val done = ending.offsets.forall { case (ConsumerPartition(_, p), off) =>
          Option(seen.get(p)).exists(_ >= off)
        }
        if (done && !completed) {
          completed = true
          new Thread(() => {
            try {
              started.await()
              queryRef.stop()
            } finally onComplete()
          }, s"$queryName-completer").start()
        }
        ()
      }.start()
    queryRef = q
    started.countDown()
    q
  }
}
