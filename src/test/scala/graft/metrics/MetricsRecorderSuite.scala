package graft.metrics

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class MetricsRecorderSuite extends SparkSuite {

  test("counters, gauges, timers") {
    val m = new InMemoryMetricsRecorder
    m.count("emit"); m.count("emit", 4); m.count("fail")
    m.assign("lag", 42.5); m.assign("lag", 7.0) // gauge overwrites
    val r = m.time("work") { 1 + 1 }
    assert(r === 2)
    val s = m.snapshot()
    assert(s("emit") === 5.0)
    assert(s("fail") === 1.0)
    assert(s("lag") === 7.0)
    assert(s("work.ms") >= 0.0)
  }

  test("lag gauge: latestOffset - endOffset per partition from progress JSON") {
    import graft.model.ConsumerPartition
    // Kafka-style progress offsets (the same wire form ConsumerState uses)
    val lags = StreamingMetricsBridge.lagBetween(
      latestJson = """{"events": {"0": 120, "1": 80, "2": 50}}""",
      endJson = """{"events": {"0": 100, "1": 80}}""").get
    assert(lags(ConsumerPartition("events", 0)) === 20L)
    assert(lags(ConsumerPartition("events", 1)) === 0L)
    // partition absent from endOffset (joined after the batch planned):
    // lag defaults to 0 rather than inventing a full-history backlog
    assert(lags(ConsumerPartition("events", 2)) === 0L)

    // clamped: a stale latest observed before the batch end cannot go negative
    val clamped = StreamingMetricsBridge.lagBetween(
      """{"t": {"0": 5}}""", """{"t": {"0": 9}}""").get
    assert(clamped(ConsumerPartition("t", 0)) === 0L)

    // non-partitioned source shapes yield no lag gauge
    assert(StreamingMetricsBridge.lagBetween("""{"logOffset": 5}""", """{"logOffset": 3}""").isEmpty)
    assert(StreamingMetricsBridge.lagBetween(null, """{"t": {"0": 1}}""").isEmpty)
    assert(StreamingMetricsBridge.lagBetween("not json", """{"t": {"0": 1}}""").isEmpty)
  }

  test("streaming bridge records per-query progress gauges") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = new InMemoryMetricsRecorder
    val bridge = StreamingMetricsBridge.install(spark, m)
    try {
      val input = MemoryStream[Int]
      val q = input.toDF().writeStream.format("noop")
        .queryName("metrics-q")
        .trigger(Trigger.ProcessingTime(20)).start()
      input.addData(1, 2, 3, 4)
      q.processAllAvailable()
      q.stop()
      // listener is async relative to processAllAvailable — poll
      val deadline = System.currentTimeMillis() + 10000
      var s = m.snapshot()
      while (!s.get("metrics-q.inputRows").exists(_ >= 4.0) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(100); s = m.snapshot()
      }
      assert(s("metrics-q.inputRows") >= 4.0)
      assert(s("metrics-q.batches") >= 1.0)
    } finally spark.streams.removeListener(bridge)
  }
}
