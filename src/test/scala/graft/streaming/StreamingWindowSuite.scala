package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.sql.Timestamp

/** Event-time windows WITH watermarks on a live stream (§2.5 streaming
  * side): windowed counts emit on watermark passage; data later than the
  * watermark is dropped. */
class StreamingWindowSuite extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window with watermark: on-time aggregates, late data dropped") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .count()

    val q = agg.writeStream
      .format("memory").queryName("win_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      // hour-0 events
      input.addData((ts("2026-01-01 00:05:00"), "a"), (ts("2026-01-01 00:20:00"), "a"),
        (ts("2026-01-01 00:40:00"), "b"))
      q.processAllAvailable()
      // advance event time far past hour 0 + watermark -> hour-0 windows close
      input.addData((ts("2026-01-01 02:00:00"), "a"))
      q.processAllAvailable()
      // this is LATER than the watermark (02:00 - 10min) -> must be dropped
      input.addData((ts("2026-01-01 00:50:00"), "a"))
      q.processAllAvailable()
      // close remaining windows
      input.addData((ts("2026-01-01 05:00:00"), "z"))
      q.processAllAvailable()

      val out = spark.table("win_out")
        .select(col("window.start").cast("string"), col("k"), col("count"))
        .as[(String, String, Long)].collect().toSet
      assert(out.contains(("2026-01-01 00:00:00", "a", 2L))) // late row NOT counted
      assert(out.contains(("2026-01-01 00:00:00", "b", 1L)))
      assert(out.contains(("2026-01-01 02:00:00", "a", 1L)))
    } finally q.stop()
  }
}
