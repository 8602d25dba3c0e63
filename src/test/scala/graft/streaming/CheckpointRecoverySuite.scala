package graft.streaming

import graft.SparkSuite
import graft.engine.SidelineEngine
import graft.model.ConsumerState
import graft.sources.LogSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import scala.collection.mutable

/** Restart recovery: the reference resumes from the ZK-persisted
  * watermark (Consumer.java:62-90); Spark resumes from the checkpoint
  * offset log. A stopped firehose restarted on the same checkpoint must
  * process each input file exactly once. */
class CheckpointRecoverySuite extends SparkSuite {

  private final class FixedLog(df: () => DataFrame) extends LogSource {
    val namespace = "file"
    def read(spark: SparkSession): DataFrame = df()
    override def currentState(spark: SparkSession): ConsumerState = ConsumerState.empty
  }

  test("firehose restart on same checkpoint resumes, no replay, no loss") {
    val sparkS = spark
    import sparkS.implicits._
    val inDir = Files.createTempDirectory("graft-in").toString
    val cpDir = Files.createTempDirectory("graft-cp").toString
    val schema = "id LONG, batch INT"

    def stream = spark.readStream.schema(schema).parquet(s"$inDir/d*")
    val engine = SidelineEngine.inMemory(new FixedLog(() => stream))
    val got = mutable.ArrayBuffer.empty[(Long, Int)]
    def sink(df: DataFrame, id: Long): Unit = got.synchronized {
      got ++= df.select("id", "batch").as[(Long, Int)].collect()
    }
    def launch() = StreamingFirehose.run(stream, engine, mainSink = sink,
      checkpointLocation = Some(cpDir), trigger = Trigger.AvailableNow(),
      queryName = "cp-firehose")

    // run 1: first file
    (0L until 50L).map(i => (i, 0)).toDF("id", "batch")
      .write.parquet(s"$inDir/d0")
    val q1 = launch()
    q1.awaitTermination(60000)
    assert(got.size === 50)

    // run 2 (restart on same checkpoint): second file only
    (50L until 80L).map(i => (i, 1)).toDF("id", "batch")
      .write.parquet(s"$inDir/d1")
    val q2 = launch()
    q2.awaitTermination(60000)

    val all = got.sortBy(_._1)
    assert(all.map(_._1) === (0L until 80L))   // no loss
    assert(all.size === 80)                    // no duplicates
    assert(got.count(_._2 == 1) === 30)
  }

  test("streaming dedup state survives a checkpointed restart") {
    // the ingest-dedup memory is state-store state: a duplicate arriving
    // AFTER a restart must still be dropped if its original is within the
    // horizon — state recovery is what makes the operator exactly-once
    // per horizon across failures, not just within one query run
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions.md5
    val inDir = Files.createTempDirectory("graft-dedup-in").toString
    val cpDir = Files.createTempDirectory("graft-dedup-cp").toString
    val schema = "doc STRING, ts TIMESTAMP"

    val emitted = mutable.ArrayBuffer.empty[String]
    def launch() = {
      val stream = spark.readStream.schema(schema).parquet(s"$inDir/d*")
      StatefulOps.dedupExactStream(stream, md5(col("doc").cast("binary")),
          "ts", horizon = "10 minutes")
        .writeStream
        // memory sink cannot recover from a checkpoint; foreachBatch can
        .foreachBatch { (df: DataFrame, _: Long) =>
          emitted.synchronized {
            emitted ++= df.select("doc").as[String].collect()
          }
          ()
        }
        .option("checkpointLocation", cpDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
    }
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // run 1: A and B emit
    Seq(("A", ts("2026-01-01 00:00:10")), ("B", ts("2026-01-01 00:00:11")))
      .toDF("doc", "ts").write.parquet(s"$inDir/d0")
    val q1 = launch()
    q1.awaitTermination(60000)
    assert(emitted.synchronized(emitted.sorted.toSeq) === Seq("A", "B"))

    // run 2 (restart on the same checkpoint): a duplicate A inside the
    // horizon and a new C — only C may emit
    Seq(("A", ts("2026-01-01 00:00:20")), ("C", ts("2026-01-01 00:00:21")))
      .toDF("doc", "ts").write.parquet(s"$inDir/d1")
    val q2 = launch()
    q2.awaitTermination(60000)
    assert(emitted.synchronized(emitted.sorted.toSeq) === Seq("A", "B", "C"),
      "dedup state was lost (duplicate re-emitted) or rows dropped across restart")
  }
}
