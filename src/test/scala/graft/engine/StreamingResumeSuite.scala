package graft.engine

import graft.SparkSuite
import graft.filter.FilterSpec
import graft.sideline.SidelineRequest
import graft.sources.FileLogSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import java.nio.file.Files
import scala.collection.mutable

/** SL2 streaming semantics: RESUME runs as a live second query with the
  * negated predicate from the snapshot, catching up in parallel while the
  * firehose keeps filtering. */
class StreamingResumeSuite extends SparkSuite {

  test("resume replay stream emits only dropped rows, from snapshot, live") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-resume").toString
    val schema = StructType.fromDDL(
      "partition INT, offset LONG, key STRING, value STRING")

    def write(part: Int, offs: Range): Unit =
      offs.map(o => (part, o.toLong, s"${o % 4}", s"v$o"))
        .toDF("partition", "offset", "key", "value")
        .write.mode("append").parquet(s"$dir/p$part-${offs.head}")

    write(0, 0 until 40)
    val log = FileLogSource(dir, schema)
    val engine = SidelineEngine.inMemory(log)

    // START at watermark 39, then RESUME
    engine.start(SidelineRequest("r", FilterSpec.KeyIn("key", Seq("1"))), spark)
    intercept[IllegalArgumentException](
      engine.sidelineReplayStream("r", spark, log)) // START state: no stream yet
    engine.resume("r")

    val got = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val q = engine.sidelineReplayStream("r", spark, log)
      .writeStream.queryName("resume-replay")
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.select("partition", "offset", "key")
            .as[(Int, Long, String)].collect()
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // nothing before/at the snapshot replays
      assert(got.isEmpty)

      // new rows arrive while sidelined: replay sees ONLY tenant '1'
      write(0, 40 until 80)
      q.processAllAvailable()
      val expected = (40 until 80).filter(_ % 4 == 1)
        .map(o => (0, o.toLong, "1"))
      assert(got.sortBy(_._2) === expected)
    } finally q.stop()
  }
}
