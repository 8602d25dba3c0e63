package graft.streaming

import graft.SparkSuite
import graft.engine.SidelineEngine
import graft.filter.FilterSpec
import graft.model.ConsumerState
import graft.sideline.SidelineRequest
import graft.sources.LogSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable

/** Streaming firehose with per-batch chain refresh — MemoryStream stands in
  * for Kafka (zero-egress env), mirroring reference E2E KafkaConsumerSpoutTest. */
class StreamingFirehoseSuite extends SparkSuite {

  /** Minimal log source over a fixed frame (chain snapshots not used here). */
  private final class FixedLog(df: () => DataFrame) extends LogSource {
    val namespace = "mem"
    def read(spark: SparkSession): DataFrame = df()
    override def currentState(spark: SparkSession): ConsumerState = ConsumerState.empty
  }

  test("firehose runs on the native V2 log source: filter parity + committed watermark") {
    import graft.sources.{GraftLog, GraftLogSource}
    val dir = java.nio.file.Files.createTempDirectory("fh-v2log").toString
    GraftLog.materialize(
      spark.range(0, 120)
        .selectExpr("cast(id % 4 as int) as partition", "id div 4 as offset",
          "cast(id % 10 as string) as key", "concat('v', id) as value"),
      dir)
    val src = GraftLogSource(dir, namespace = "v2", rate = Some(40L))
    val engine = SidelineEngine.inMemory(src)
    engine.start(SidelineRequest("s1", FilterSpec.KeyIn("key", Seq("3", "7"))), spark)

    val main = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val handle = new StreamingFirehose.FirehoseHandle
    val q = StreamingFirehose.run(
      src.readStreamFrom(spark), engine,
      mainSink = (df, _) => main.synchronized {
        main ++= df.select("partition", "offset", "key").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      },
      handle = Some(handle))
    q.awaitTermination(60000)

    // parity with the batch face over the same V2 read
    val want = src.read(spark)
      .filter(!col("key").isin("3", "7"))
      .select("partition", "offset", "key").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted
    assert(main.sorted === want.toSeq)
    // the admission cap kept batches bounded, so >1 batch committed, and
    // the final watermark is every partition's top offset
    val st = handle.committedState.offsets
    assert(st.keySet.map(_.partition) === Set(0, 1, 2, 3))
    assert(st.values.toSet === Set(29L), st.toString)
  }

  test("chain mutations between micro-batches are honored; failed routing works") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(String, Long, Boolean)]
    val stream = input.toDF().toDF("key", "offset", "permanently_failed")

    val engine = SidelineEngine.inMemory(new FixedLog(() => stream))
    val main = mutable.ArrayBuffer.empty[(String, Long)]
    val failed = mutable.ArrayBuffer.empty[(String, Long)]
    val metrics = mutable.ArrayBuffer.empty[StreamingFirehose.BatchMetrics]

    val query = StreamingFirehose.run(
      stream, engine,
      mainSink = (df, _) => main.synchronized {
        main ++= df.select("key", "offset").as[(String, Long)].collect()
      },
      failedSink = (df, _) => failed.synchronized {
        failed ++= df.select("key", "offset").as[(String, Long)].collect()
      },
      onMetrics = m => metrics.synchronized { metrics += m },
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))

    try {
      // batch 1: no chain installed
      input.addData(("a", 0L, false), ("b", 1L, false), ("c", 2L, true))
      query.processAllAvailable()
      // mutate the chain mid-stream (sideline START equivalent)
      engine.start(SidelineRequest("s1", FilterSpec.KeyIn("key", Seq("a"))), spark)
      // batch 2: 'a' rows must now be dropped
      input.addData(("a", 3L, false), ("b", 4L, false))
      query.processAllAvailable()

      assert(main.sorted === Seq(("a", 0L), ("b", 1L), ("b", 4L)))
      assert(failed.sorted === Seq(("c", 2L)))

      // metrics: one drop (the ("a",3L) row), one failed, three emitted
      val agg = metrics.foldLeft((0L, 0L, 0L, 0L)) { case ((i, e, f, d), m) =>
        (i + m.input, e + m.emitted, f + m.failed, d + m.filtered)
      }
      assert(agg === ((5L, 3L, 1L, 1L)))
    } finally query.stop()
  }
}
