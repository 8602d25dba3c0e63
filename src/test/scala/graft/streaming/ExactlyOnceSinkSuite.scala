package graft.streaming

import graft.SparkSuite
import graft.engine.SidelineEngine
import graft.model.ConsumerState
import graft.sources.LogSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/**
 * The exactly-once PROOF (SURVEY.md §2.13): foreachBatch is
 * at-least-once — a crash between sink output and the checkpoint commit
 * re-delivers the batch — so exactly-once output must come from the
 * sink. These cases drive [[IdempotentBatchSink]] through both crash
 * orderings, including a real checkpointed firehose restart that
 * re-delivers a batch the sink already committed.
 */
class ExactlyOnceSinkSuite extends SparkSuite {

  private final class FixedLog(df: () => DataFrame) extends LogSource {
    val namespace = "file"
    def read(spark: SparkSession): DataFrame = df()
    override def currentState(spark: SparkSession): ConsumerState = ConsumerState.empty
  }

  test("re-delivered committed batch is skipped; torn uncommitted attempt is overwritten") {
    val sparkS = spark
    import sparkS.implicits._
    val root = Files.createTempDirectory("graft-eos-unit").toString
    val sink = new IdempotentBatchSink(root)

    // double delivery of the same batchId → one copy
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink.write(b0, 0L)
    sink.write(b0, 0L)
    assert(sink.read(spark).count() === 2)

    // crash BEFORE the marker: simulate a torn attempt for batch 1 (data
    // partially written, no commit marker) — invisible to readers, and
    // replay replaces it wholesale instead of appending
    Seq((99L, "garbage")).toDF("id", "v")
      .write.parquet(s"$root/data/batch_id=1")
    assert(sink.read(spark).count() === 2, "torn batch leaked into reads")
    sink.write(Seq((3L, "c")).toDF("id", "v"), 1L)
    val all = sink.read(spark).select("id").as[Long].collect().sorted
    assert(all === Array(1L, 2L, 3L), s"torn attempt not replaced: ${all.toSeq}")
  }

  test("crash AFTER sink commit, BEFORE checkpoint commit: restart re-delivers, output has no duplicates") {
    val sparkS = spark
    import sparkS.implicits._
    val inDir = Files.createTempDirectory("graft-eos-in").toString
    val cpDir = Files.createTempDirectory("graft-eos-cp").toString
    val outRoot = Files.createTempDirectory("graft-eos-out").toString
    val sink = new IdempotentBatchSink(outRoot)
    val schema = "id LONG, run INT"

    // crash injection: the first delivery of any batch containing run=1
    // fails AFTER the sink committed — exactly the window where Spark's
    // checkpoint has NOT advanced and will re-deliver the same batchId
    @volatile var crashed = false
    def mainSink(df: DataFrame, batchId: Long): Unit = {
      val poison = df.filter(df("run") === 1).count() > 0
      sink.write(df, batchId)
      if (poison && !crashed) {
        crashed = true
        throw new RuntimeException("injected crash after sink commit")
      }
    }
    def launch() = {
      val stream = spark.readStream.schema(schema).parquet(s"$inDir/d*")
      StreamingFirehose.run(stream, SidelineEngine.inMemory(new FixedLog(() => stream)),
        mainSink = mainSink, checkpointLocation = Some(cpDir),
        trigger = Trigger.AvailableNow(), queryName = "eos-firehose")
    }

    // run 1: clean batch commits normally
    (0L until 40L).map((_, 0)).toDF("id", "run").write.parquet(s"$inDir/d0")
    val q1 = launch()
    q1.awaitTermination(60000)
    assert(sink.read(spark).count() === 40)

    // run 2: poisoned batch — sink commits, then the query dies before
    // the checkpoint advances
    (40L until 70L).map((_, 1)).toDF("id", "run").write.parquet(s"$inDir/d1")
    val q2 = launch()
    intercept[Exception] { q2.awaitTermination(60000) }
    assert(crashed, "injected crash did not fire")

    // run 3 (same checkpoint): Spark RE-DELIVERS the poisoned batch with
    // the same batchId; the sink skips it (marker exists). New data in
    // the same run still flows.
    (70L until 80L).map((_, 2)).toDF("id", "run").write.parquet(s"$inDir/d2")
    val q3 = launch()
    q3.awaitTermination(60000)

    val ids = sink.read(spark).select("id").as[Long].collect().sorted
    assert(ids.length === 80, s"expected 80 unique rows, got ${ids.length}")
    assert(ids === (0L until 80L).toArray, "loss or duplication across the replay")
  }
}
