// ThrottlePolicy end-to-end drive via the PACKAGED jar (r10 verdict ask
// #7): two concurrent file-log streams under one QueryCoordinator, one
// matched by the throttle regex — assert the MEASURED admission-rate
// ratio from StreamingQueryProgress sits in a band around the
// CONFIGURED nominal ratio (reference ThrottledMessageBuffer /
// RatioMessageBuffer semantics, buffer/ThrottledMessageBuffer.java:73,
// buffer/RatioMessageBuffer.java:76).
//
// Parameters are chosen so the trigger INTERVAL binds, not batch
// processing time (2 small files per 500 ms trigger processes in well
// under 500 ms on local[4]) — otherwise the measured ratio compresses
// toward the processing-time ratio and says nothing about the policy.
// Nominal: (2 files / 500 ms) vs (1 file / 1500 ms) = 6x admission.
// The acceptance band is [nominal/2, nominal*2]: trigger scheduling
// jitter and the first-trigger alignment make exact equality
// unmeasurable in a 12 s window, but a binding throttle cannot miss a
// 2x band around 6x (an ignored policy measures ~1x, a
// processing-bound run ~2x).
//
// Run:
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//     --conf spark.scheduler.mode=FAIR \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     -I scripts/throttle_drive.scala
// Grep output with: grep -oE 'THROTTLE_DRIVE .*'  (progress bars glue CRs)

object ThrottleDrive {
  import graft.engine.{QueryCoordinator, ThrottlePolicy}
  import graft.sources.FileLogSource
  import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
  import org.apache.spark.sql.streaming.Trigger
  import org.apache.spark.sql.types.StructType
  import java.nio.file.Files
  import java.util.concurrent.atomic.AtomicLong

  def run(spark: SparkSession): Int = {
    var failures = 0
    def tag(msg: String): Unit = println(s"THROTTLE_DRIVE $msg")
    def check(cond: Boolean, what: String): Unit =
      if (cond) tag(s"PASS $what") else { failures += 1; tag(s"FAIL $what") }

    // 600-file backlog of 10 rows each: one file is one admission unit,
    // deep enough that neither query drains it inside the measurement
    // window (the unthrottled side admits ~2 files/500ms = ~60 in 15 s),
    // shallow enough that the per-trigger directory listing stays cheap.
    val dir = Files.createTempDirectory("graft-throttle").toString
    val schema = StructType.fromDDL(
      "partition INT, offset LONG, key STRING, value STRING")
    spark.range(0, 6000)
      .selectExpr("cast(id % 4 as int) as partition", "id as offset",
        "cast(id as string) as key", "concat('v', id) as value")
      .repartition(600)
      .write.mode(SaveMode.Overwrite).parquet(dir)

    val policy = ThrottlePolicy(
      defaultRatePerTrigger = 2,
      throttledRatePerTrigger = 1,
      throttledPattern = Some("sideline".r),
      triggerRatio = 3)
    val baseMs = 500L
    val nominal = // admission ratio the policy CONFIGURES
      (policy.defaultRatePerTrigger.toDouble / baseMs) /
        (policy.throttledRatePerTrigger.toDouble / (baseMs * policy.triggerRatio))
    tag(f"configured nominal admission ratio = $nominal%.1f")

    val coord = new QueryCoordinator(spark, maxConcurrentQueries = 2)
    def fileStream(shaping: QueryCoordinator.Shaping, name: String) =
      FileLogSource(dir, schema,
          maxFilesPerTrigger = Some(shaping.ratePerTrigger.toInt))
        .readStreamFrom(spark)
        .writeStream.queryName(name)
        .trigger(Trigger.ProcessingTime(shaping.triggerIntervalMs))
        .foreachBatch { (df: DataFrame, _: Long) => df.count(); () }
        .start()

    val qMain = coord.launchShaped("firehose:main", policy,
      baseTriggerMs = baseMs, pool = "pool-main")(s => fileStream(s, "thr-main"))
    val qSide = coord.launchShaped("fh:sideline:replay", policy,
      baseTriggerMs = baseMs, pool = "pool-side")(s => fileStream(s, "thr-side"))
    check(policy.isThrottled("fh:sideline:replay") &&
      !policy.isThrottled("firehose:main"), "regex selects exactly the sideline id")

    // rates come from StreamingQueryProgress — the same surface the
    // reference's status report maps to. Startup (checkpoint setup,
    // first listing) is excluded: wait until BOTH queries have admitted
    // rows, snapshot, then measure the DELTA over a fixed window.
    def admitted(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.map(_.numInputRows).sum
    val warmDeadline = System.nanoTime() + 60L * 1000000000L
    while ((admitted(qMain) == 0 || admitted(qSide) == 0) &&
        System.nanoTime() < warmDeadline)
      Thread.sleep(200)
    check(admitted(qMain) > 0 && admitted(qSide) > 0,
      "both queries admitted rows within the warmup budget")
    val (m0, s0) = (admitted(qMain), admitted(qSide))
    Thread.sleep(15000)
    val mainRows = admitted(qMain) - m0
    val sideRows = admitted(qSide) - s0
    val st = coord.status()
      .map(s => f"${s.name}@${s.inputRowsPerSecond}%.1f rows/s").mkString(", ")
    coord.close(5000)
    val ratio = mainRows.toDouble / math.max(sideRows, 1L)
    tag(s"window delta: main=$mainRows rows, side=$sideRows rows; status=[$st]")
    tag(f"measured admission ratio = $ratio%.2f (nominal $nominal%.1f)")
    check(sideRows > 0, "throttled query made progress")
    check(ratio >= nominal / 2 && ratio <= nominal * 2,
      f"measured ratio $ratio%.2f within [${nominal / 2}%.1f, ${nominal * 2}%.1f]")

    tag(if (failures == 0) "ALL-PASS" else s"FAILURES=$failures")
    failures
  }
}

val rc = ThrottleDrive.run(spark)
System.exit(if (rc == 0) 0 else 1)
