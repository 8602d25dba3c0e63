package graft.sources

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The reference's full topology, native end-to-end: consume from one
  * log through the V2 MicroBatchStream (owned offsets), transform,
  * produce into ANOTHER log through the V2 streaming sink (epoch-
  * idempotent commit). Stop/grow/resume and a checkpoint-commit crash
  * replay must leave the downstream log an exactly-once image of the
  * transformed upstream. */
class GraftLogPipelineSuite extends SparkSuite {

  private def rows(dir: String): Seq[(Int, Long, String, String)] =
    spark.read.format("graftlog").option("path", dir).load()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("log→transform→log: resume picks up growth, crash replay adds nothing, offsets dense") {
    val aDir = Files.createTempDirectory("graftlog-pipe-a").toString
    val bDir = Files.createTempDirectory("graftlog-pipe-b").toString
    val cpDir = Files.createTempDirectory("graftlog-pipe-cp").toString

    def feed(n: Int, from: Long): Unit =
      spark.range(from, from + n)
        .selectExpr("cast(id % 2 as int) as partition", "id div 2 as offset",
          "cast(id as string) as key", "concat('v', id) as value")
        .write.mode(if (from == 0) "overwrite" else "append")
        .partitionBy("partition").parquet(aDir)

    def launch() = spark.readStream.format("graftlog").option("path", aDir).load()
      .selectExpr("partition", "cast(-1 as long) as offset", "key",
        "upper(value) as value")
      .writeStream.format("graftlog")
      .option("path", bDir).option("offsets", "assign")
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()

    feed(60, 0)
    val q1 = launch(); q1.awaitTermination(60000)
    assert(rows(bDir).length === 60)

    // the upstream grows while the pipeline is down; resume drains only
    // the growth (the stream's owned offsets, not file-listing state)
    feed(40, 1000) // offsets continue densely per partition (id div 2)
    val q2 = launch(); q2.awaitTermination(60000)
    val afterGrowth = rows(bDir)
    assert(afterGrowth.length === 100, s"resume mis-drained: ${afterGrowth.length}")

    // crash ordering: sink committed epoch, checkpoint did not — replay
    // of the LAST epoch must add nothing downstream
    val fs = new Path(cpDir).getFileSystem(spark.sessionState.newHadoopConf())
    val lastCommit = fs.listStatus(new Path(cpDir, "commits")).toSeq
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
    assert(fs.delete(new Path(cpDir, s"commits/$lastCommit"), false))
    val q3 = launch(); q3.awaitTermination(60000)
    val afterReplay = rows(bDir)
    assert(afterReplay === afterGrowth, "epoch replay mutated the downstream log")

    // exactly-once image: every upstream row exactly once, transformed
    val upstream = rows(aDir)
    assert(afterReplay.map(_._4).sorted === upstream.map(_._4.toUpperCase).sorted)
    afterReplay.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2) === (0L until rs.length.toLong),
        s"downstream partition $p not dense")
    }
    // co-partitioned end to end: each upstream key stayed in its partition
    val upKey = upstream.map(t => t._3 -> t._1).toMap
    afterReplay.foreach { case (p, _, k, _) => assert(upKey(k) === p) }
  }
}
