// Sideline lifecycle drive over the NATIVE V2 log connector, via the
// PACKAGED jar (r11 verdict ask #2): the reference's resume-while-active
// scenario (salesforce/storm-dynamic-spout SidelineSpoutTest.java:237)
// with every data surface native — the firehose consumes graftlog's
// MicroBatchStream, START snapshots positions from parquet FOOTER stats,
// RESUME's live replay stream rides the connector's startingOffsets,
// RESOLVE drains through the planned (not filtered) bounded batch read,
// and the firehose's main emit PRODUCES into a second graftlog through
// the exactly-once batch producer face.
//
// Run:
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     -I scripts/sideline_drive_graftlog.scala
// Grep output with: grep -oE 'GRAFTLOG_DRIVE .*'
object SidelineDriveGraftlog {
  import graft.engine.{QueryCoordinator, SidelineEngine}
  import graft.filter.FilterSpec
  import graft.model.ConsumerPartition
  import graft.sideline.SidelineRequest
  import graft.sources.{GraftLog, GraftLogSource}
  import graft.streaming.StreamingFirehose
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.streaming.Trigger
  import java.nio.file.Files
  import scala.collection.mutable

  def run(spark: SparkSession): Int = {
    val sparkS = spark
    import sparkS.implicits._

    var failures = 0
    def tag(msg: String): Unit = println(s"GRAFTLOG_DRIVE $msg")
    def check(cond: Boolean, what: String): Unit =
      if (cond) tag(s"PASS $what") else { failures += 1; tag(s"FAIL $what") }

    val logDir = Files.createTempDirectory("graftlog-drive").toString
    val outDir = Files.createTempDirectory("graftlog-drive-out").toString
    val cpDir = Files.createTempDirectory("graftlog-drive-cp").toString

    def writeChunk(offsets: Range): Unit =
      (for (p <- 0 until 2; o <- offsets)
        yield (p, o.toLong, s"${o % 5}", s"v$p-$o"))
        .toDF("partition", "offset", "key", "value")
        .repartition(col("partition"))
        .write.mode("append").partitionBy("partition").parquet(logDir)

    writeChunk(0 until 60)
    val log = GraftLogSource(logDir)
    val engine = SidelineEngine.inMemory(log)
    val coord = new QueryCoordinator(spark)

    // main emit: EXACTLY-ONCE produce into a downstream graftlog using
    // the DELIVERED foreachBatch id (a self-made counter would defeat
    // the replay protocol); the original (partition, offset, key)
    // coordinates ride in `value` so parity reads back from the
    // downstream log alone
    def emitted(): Set[(Int, Long, String)] =
      spark.read.format("graftlog").option("path", outDir).load()
        .select("value").as[String].collect()
        .map { s => val a = s.split(':'); (a(0).toInt, a(1).toLong, a(2)) }
        .toSet

    val fh = coord.launch("firehose", pool = "firehose") {
      StreamingFirehose.run(log.readStreamFrom(spark), engine,
        mainSink = (df, batchId) => {
          val batch = df.selectExpr("partition", "cast(-1 as long) as offset",
            "key", "concat_ws(':', partition, offset, key) as value")
          GraftLog.appendBatch(batch, outDir, batchId, producerId = "drive")
          ()
        },
        checkpointLocation = Some(cpDir),
        trigger = Trigger.ProcessingTime(100), queryName = "graftlog-firehose")
    }

    try {
      fh.processAllAvailable()
      check(emitted().size == 120,
        s"pre-sideline firehose produced all 120 rows into the downstream log")

      // ---- START while the firehose is live: footer-stats snapshot ---
      engine.start(SidelineRequest("t2", FilterSpec.KeyIn("key", Seq("2"))), spark)
      val starting = engine.store.retrieve("t2").get.startingState
      check(starting.offsets ==
          Map(ConsumerPartition("graftlog", 0) -> 59L,
            ConsumerPartition("graftlog", 1) -> 59L),
        s"START snapshot from footer statistics: $starting")

      writeChunk(60 until 120)
      fh.processAllAvailable()
      val duringStart = emitted().filter(t => t._2 >= 60)
      check(duringStart.nonEmpty && !duringStart.exists(_._3 == "2"),
        s"firehose drops tenant 2 after START (${duringStart.size} rows)")

      // ---- RESUME: live replay stream over the NATIVE source ---------
      engine.resume("t2")
      val replayed = mutable.ArrayBuffer.empty[(Int, Long, String)]
      val replayQ = coord.launch("t2-replay", pool = "sideline") {
        engine.sidelineReplayStream("t2", spark, log)
          .select("partition", "offset", "key")
          .writeStream.queryName("t2-replay")
          .trigger(Trigger.ProcessingTime(100))
          .option("checkpointLocation",
            Files.createTempDirectory("graftlog-drive-rp").toString)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            replayed.synchronized {
              replayed ++= df.as[(Int, Long, String)].collect()
            }
            ()
          }.start()
      }
      replayQ.processAllAvailable()
      val replayAfterResume = replayed.synchronized(replayed.size)
      check(replayAfterResume > 0 &&
          replayed.synchronized(replayed.forall(_._3 == "2")) &&
          replayed.synchronized(replayed.forall(_._2 >= 60)),
        s"RESUME stream replays only tenant 2 AFTER the snapshot — the " +
          s"connector's startingOffsets, not a filter ($replayAfterResume rows)")

      // ---- more data with BOTH queries live --------------------------
      writeChunk(120 until 180)
      fh.processAllAvailable()
      replayQ.processAllAvailable()
      check(replayed.synchronized(replayed.size) > replayAfterResume,
        "live replay stream catches up with data written after RESUME")

      // ---- RESOLVE: footer-stats ending, planned batch drain ---------
      engine.resolve("t2", spark)
      coord.remove("t2-replay")
      val drained = engine.sidelineReplay("t2", spark)
        .select("partition", "offset", "key")
        .as[(Int, Long, String)].collect().toSet
      tag(s"RESOLVE stamped; planned-window drain: ${drained.size} rows")

      val p = engine.store.retrieve("t2").get
      val window = log.readBounded(spark, p.startingState, p.endingState)
        .select("partition", "offset", "key")
        .as[(Int, Long, String)].collect().toSet
      val fhInWindow = emitted().filter(window.contains)
      check((fhInWindow ++ drained) == window,
        s"union parity on the native log: firehose(${fhInWindow.size}) ∪ " +
          s"replay(${drained.size}) ≡ window(${window.size})")
      check(fhInWindow.intersect(drained).isEmpty,
        "disjoint: no row delivered by both paths")
      check(drained.forall(_._3 == "2"),
        "drained rows are exactly the sidelined tenant")

      // ---- completion: the firehose readmits the tenant --------------
      engine.complete("t2")
      writeChunk(180 until 200)
      fh.processAllAvailable()
      val afterComplete = emitted().filter(t => t._2 >= 180)
      check(afterComplete.exists(_._3 == "2"),
        "after RESOLVE+complete the firehose produces tenant 2 again")

      // downstream log sanity: the exactly-once producer kept offsets
      // dense across every batch of the drive
      val down = spark.read.format("graftlog").option("path", outDir).load()
        .groupBy("partition")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.max("offset").as("mx"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      check(down.forall { case (_, n, mx) => mx == n - 1 },
        s"downstream log offsets dense per partition: ${down.toSeq}")
    } finally {
      coord.close(5000)
    }
    tag(if (failures == 0) "ALL PASS" else s"$failures FAILURES")
    failures
  }
}
val rc = SidelineDriveGraftlog.run(spark)
System.exit(if (rc == 0) 0 else 1)
