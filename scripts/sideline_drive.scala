// Sideline lifecycle drive via the PACKAGED jar (r9 verdict ask #6):
// START → RESUME (live concurrent replay stream) → RESOLVE against a
// RUNNING firehose, asserting the union-parity invariant at the
// consumption layer — the reference's resume-while-active scenario
// (salesforce/storm-dynamic-spout SidelineSpoutTest.java:237) driven
// through the library surface a user actually holds
// (graft.engine.SidelineEngine / QueryCoordinator / StreamingFirehose).
//
// Run:
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     -I scripts/sideline_drive.scala
// Grep output with: grep -oE 'SIDELINE_DRIVE .*'  (progress bars glue CRs)
//
// NOTE the whole drive lives in ONE object: spark-shell -I feeds the file
// line by line, and a multi-line expression with leading-dot continuation
// splits into fragments at top level (r10 lesson) — inside an object the
// parser reads to the closing brace.

object SidelineDrive {
  import graft.engine.{QueryCoordinator, SidelineEngine}
  import graft.filter.FilterSpec
  import graft.sideline.SidelineRequest
  import graft.sources.FileLogSource
  import graft.streaming.StreamingFirehose
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.streaming.Trigger
  import org.apache.spark.sql.types.StructType
  import java.nio.file.Files
  import scala.collection.mutable

  def run(spark: SparkSession): Int = {
    val sparkS = spark
    import sparkS.implicits._

    var failures = 0
    def tag(msg: String): Unit = println(s"SIDELINE_DRIVE $msg")
    def check(cond: Boolean, what: String): Unit =
      if (cond) tag(s"PASS $what") else { failures += 1; tag(s"FAIL $what") }

    val inDir = Files.createTempDirectory("graft-drive-in").toString
    val cpDir = Files.createTempDirectory("graft-drive-cp").toString
    val schema = StructType.fromDDL(
      "partition INT, offset LONG, key STRING, value STRING")

    def writeChunk(part: Int, offsets: Range): Unit = {
      val df = offsets.map(o => (part, o.toLong, s"${o % 5}", s"v$o"))
        .toDF("partition", "offset", "key", "value")
      df.write.mode("append").parquet(s"$inDir/d$part")
    }

    // ---- the log + engine + coordinator, all library surface ---------
    writeChunk(0, 0 until 60)
    writeChunk(1, 0 until 60)
    val log = FileLogSource(inDir + "/d*", schema)
    val engine = SidelineEngine.inMemory(log)
    val coord = new QueryCoordinator(spark)

    val emitted = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val fh = coord.launch("firehose", pool = "firehose") {
      StreamingFirehose.run(
        spark.readStream.schema(schema).parquet(s"$inDir/d*"),
        engine,
        mainSink = (df, _) => emitted.synchronized {
          emitted ++= df.select("partition", "offset", "key")
            .as[(Int, Long, String)].collect()
        },
        checkpointLocation = Some(cpDir),
        trigger = Trigger.ProcessingTime(100), queryName = "firehose")
    }

    try {
      fh.processAllAvailable()
      val beforeStart = emitted.size
      check(beforeStart == 120,
        s"pre-sideline firehose emitted all 120 rows (got $beforeStart)")

      // ---- START while the firehose is live --------------------------
      engine.start(SidelineRequest("t2", FilterSpec.KeyIn("key", Seq("2"))), spark)
      tag("START t2 (key='2') persisted; firehose keeps running")

      writeChunk(0, 60 until 120)
      writeChunk(1, 60 until 120)
      fh.processAllAvailable()
      val duringStart = emitted.synchronized(emitted.toSeq.drop(beforeStart))
      check(duringStart.nonEmpty && !duringStart.exists(_._3 == "2"),
        s"firehose drops tenant 2 after START (${duringStart.size} rows)")

      // ---- RESUME: live concurrent replay stream ---------------------
      engine.resume("t2")
      val replayed = mutable.ArrayBuffer.empty[(Int, Long, String)]
      val replayQ = coord.launch("t2-replay", pool = "sideline") {
        engine.sidelineReplayStream("t2", spark, log)
          .select("partition", "offset", "key")
          .writeStream.queryName("t2-replay")
          .trigger(Trigger.ProcessingTime(100))
          .option("checkpointLocation",
            Files.createTempDirectory("graft-drive-rp").toString)
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
          replayed.synchronized(replayed.forall(_._3 == "2")),
        s"RESUME stream replays only the sidelined tenant " +
          s"($replayAfterResume rows, both queries live)")

      // ---- more data with BOTH queries active ------------------------
      writeChunk(0, 120 until 180)
      writeChunk(1, 120 until 180)
      fh.processAllAvailable()
      replayQ.processAllAvailable()
      val duringResume = emitted.synchronized(
        emitted.toSeq.drop(beforeStart + duringStart.size))
      check(duringResume.nonEmpty && !duringResume.exists(_._3 == "2"),
        "firehose still drops tenant 2 while the replay stream runs beside it")
      check(replayed.synchronized(replayed.size) > replayAfterResume,
        "live replay stream catches up with data written after RESUME")

      // ---- RESOLVE: bound the window, stop the stream, drain ---------
      // Both queries are quiesced (processAllAvailable between triggers),
      // so the current high watermark IS batch-aligned — resolve()'s
      // contract; a live un-quiesced firehose would use resolveAt with
      // the last committed progress instead.
      engine.resolve("t2", spark)
      coord.remove("t2-replay")
      val drained = engine.sidelineReplay("t2", spark)
        .select("partition", "offset", "key")
        .as[(Int, Long, String)].collect().toSet
      tag(s"RESOLVE stamped; batch drain of the closed window: ${drained.size} rows")

      // ---- invariant: firehose ∪ sideline ≡ window, disjoint --------
      val p = engine.store.retrieve("t2").get
      val window = log.readBounded(spark, p.startingState, p.endingState)
        .select("partition", "offset", "key")
        .as[(Int, Long, String)].collect().toSet
      val fhInWindow = emitted.synchronized(emitted.toSet).filter(window.contains)
      check((fhInWindow ++ drained) == window,
        s"union parity: firehose(${fhInWindow.size}) ∪ replay(${drained.size}) " +
          s"≡ window(${window.size})")
      check(fhInWindow.intersect(drained).isEmpty,
        "disjoint: no row delivered by both paths")
      check(drained.forall(_._3 == "2"),
        "drained rows are exactly the sidelined tenant")
      check(replayed.synchronized(replayed.toSet).subsetOf(drained),
        "live-replay rows are a prefix of the closed-window drain")

      // ---- completion: the firehose readmits the tenant --------------
      engine.complete("t2")
      writeChunk(0, 180 until 200)
      fh.processAllAvailable()
      val afterComplete = emitted.synchronized(
        emitted.toSeq.drop(beforeStart + duringStart.size + duringResume.size))
      check(afterComplete.exists(_._3 == "2"),
        "after RESOLVE+complete the firehose emits tenant 2 again")
    } finally coord.close(5000)

    tag(if (failures == 0) "RESULT ALL-PASS" else s"RESULT $failures FAILURES")
    failures
  }
}

val rc = SidelineDrive.run(spark)
System.exit(if (rc == 0) 0 else 1)
