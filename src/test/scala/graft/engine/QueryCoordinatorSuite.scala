package graft.engine

import graft.SparkSuite
import graft.filter.FilterSpec
import graft.model.ConsumerState
import graft.sideline.SidelineRequest
import graft.sources.LogSource
import graft.streaming.StreamingFirehose
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class QueryCoordinatorSuite extends SparkSuite {

  private final class FixedLog(df: () => DataFrame) extends LogSource {
    val namespace = "mem"
    def read(spark: SparkSession): DataFrame = df()
    override def currentState(spark: SparkSession): ConsumerState = ConsumerState.empty
  }

  private def memQuery(name: String): (MemoryStream[(String, Long)], SidelineEngine, QueryCoordinator => org.apache.spark.sql.streaming.StreamingQuery) = {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("key", "offset")
    val engine = SidelineEngine.inMemory(new FixedLog(() => stream))
    val start = (c: QueryCoordinator) => c.launch(name, pool = s"pool-$name") {
      StreamingFirehose.run(stream, engine, mainSink = (_, _) => (),
        trigger = Trigger.ProcessingTime(50), queryName = name)
    }
    (input, engine, start)
  }

  test("registry, cap, duplicate rejection, status, graceful close") {
    val coord = new QueryCoordinator(spark, maxConcurrentQueries = 2)
    val (in1, _, start1) = memQuery("q1")
    val (_, _, start2) = memQuery("q2")
    val q1 = start1(coord)
    start2(coord)
    assert(coord.activeNames === Seq("q1", "q2"))
    // duplicate name rejected
    intercept[IllegalArgumentException] {
      coord.launch("q1")(throw new IllegalStateException("not reached"))
    }
    // cap enforced (reference max_concurrent_virtual_spouts)
    val (_, _, start3) = memQuery("q3")
    intercept[IllegalArgumentException](start3(coord))

    in1.addData(("a", 1L), ("b", 2L))
    q1.processAllAvailable()
    val st = coord.status().find(_.name == "q1").get
    assert(st.active && st.pool === "pool-q1")
    assert(st.numInputRows === 2L)

    // remove frees a slot
    coord.remove("q2")
    assert(coord.activeNames === Seq("q1"))
    start3(coord)
    assert(coord.activeNames === Seq("q1", "q3"))

    coord.close(maxWaitMs = 5000)
    assert(coord.activeNames.isEmpty)
  }

  test("error channel captures failing query terminations") {
    val coord = new QueryCoordinator(spark, maxConcurrentQueries = 2)
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Int]
    val q = coord.launch("boom") {
      input.toDF().writeStream
        .queryName("boom")
        .trigger(Trigger.ProcessingTime(20))
        .foreachBatch { (df: DataFrame, _: Long) =>
          if (df.count() > 0) throw new RuntimeException("synthetic failure")
          ()
        }.start()
    }
    input.addData(1, 2, 3)
    intercept[Exception](q.processAllAvailable())
    // listener runs async — poll briefly
    val deadline = System.currentTimeMillis() + 10000
    var errs = coord.drainErrors()
    while (errs.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); errs = coord.drainErrors()
    }
    assert(errs.nonEmpty)
    assert(errs.head._1 === "boom")
    assert(errs.head._2.contains("synthetic failure"))
    coord.close(1000)
  }

  test("launchShaped applies the throttle policy: measured two-firehose fairness") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.types._
    import java.util.concurrent.atomic.AtomicLong

    // 40 small files of 50 rows each; each file is one admission unit for
    // the file stream source, so ratePerTrigger = maxFilesPerTrigger.
    val dir = java.nio.file.Files.createTempDirectory("graft-fair").toString
    val schema = StructType(Seq(
      StructField("partition", IntegerType), StructField("offset", LongType),
      StructField("key", StringType), StructField("value", StringType)))
    spark.range(0, 2000)
      .selectExpr("cast(id % 4 as int) as partition", "id as offset",
        "cast(id as string) as key", "concat('v', id) as value")
      .repartition(40)
      .write.mode(SaveMode.Overwrite).parquet(dir)

    // ThrottledMessageBuffer semantics: ids matching the regex get the
    // reduced rate; RatioMessageBuffer semantics: and 3x the interval.
    val policy = ThrottlePolicy(
      defaultRatePerTrigger = 8,
      throttledRatePerTrigger = 1,
      throttledPattern = Some("sideline".r),
      triggerRatio = 3)
    val coord = new QueryCoordinator(spark, maxConcurrentQueries = 2)
    val mainRows = new AtomicLong; val sideRows = new AtomicLong

    def fileStream(shaping: QueryCoordinator.Shaping, counter: AtomicLong,
        name: String): org.apache.spark.sql.streaming.StreamingQuery =
      graft.sources.FileLogSource(dir, schema,
          maxFilesPerTrigger = Some(shaping.ratePerTrigger.toInt))
        .readStreamFrom(spark)
        .writeStream.queryName(name)
        .trigger(Trigger.ProcessingTime(shaping.triggerIntervalMs))
        .foreachBatch { (df: DataFrame, _: Long) =>
          counter.addAndGet(df.count()); ()
        }.start()

    coord.launchShaped("firehose:main", policy, baseTriggerMs = 100L,
      pool = "pool-main")(s => fileStream(s, mainRows, "fair-main"))
    coord.launchShaped("fh:sideline:replay", policy, baseTriggerMs = 100L,
      pool = "pool-side")(s => fileStream(s, sideRows, "fair-side"))

    // let both run against the same 40-file backlog for a fixed window
    Thread.sleep(3000)
    val (m, s) = (mainRows.get(), sideRows.get())
    coord.close(5000)
    info(f"fairness window: unthrottled=$m%d rows, throttled=$s%d rows, ratio=${m.toDouble / math.max(s, 1)}%.1f")
    assert(s > 0, "throttled query made no progress at all")
    // nominal admission ratio is 24x (8 files/100ms vs 1 file/300ms);
    // assert a conservative 2x so scheduler jitter cannot flake the test
    assert(m >= 2 * s, s"throttle had no measurable effect: main=$m side=$s")
  }

  test("lifecycle hooks fire on launch/remove/completion/close and isolate failures") {
    val events = scala.collection.mutable.Buffer.empty[String]
    val hooks = new EngineHooks {
      override def onQueryStart(name: String): Unit = { events += s"start:$name"; () }
      override def onQueryStop(name: String): Unit = {
        events += s"stop:$name"
        // hook failures must not break the coordinator
        throw new RuntimeException("hook boom")
      }
      override def onQueryCompletion(name: String): Unit = { events += s"done:$name"; () }
    }
    val coord = new QueryCoordinator(spark, maxConcurrentQueries = 3, hooks)
    val (_, _, start1) = memQuery("h1")
    val (_, _, start2) = memQuery("h2")
    start1(coord); start2(coord)
    assert(events.toSeq === Seq("start:h1", "start:h2"))
    coord.remove("h1") // onQueryStop throws — swallowed
    assert(events.toSeq === Seq("start:h1", "start:h2", "stop:h1"))
    // bounded-drain self-completion path
    coord.completed("h2")
    assert(events.last === "done:h2")
    assert(coord.activeNames.isEmpty || !coord.activeNames.contains("h2"))
    coord.close(2000)
  }

  test("throttle policy: regex rate caps and trigger ratio") {
    val p = ThrottlePolicy(
      defaultRatePerTrigger = 10000,
      throttledRatePerTrigger = 500,
      throttledPattern = Some("sideline".r),
      triggerRatio = 4)
    assert(p.ratePerTrigger("firehose:main") === 10000)
    assert(p.ratePerTrigger("prefix:sideline:abc") === 500)
    assert(p.triggerIntervalMs("prefix:sideline:abc", 100) === 400)
    assert(p.triggerIntervalMs("firehose:main", 100) === 100)
    val none = ThrottlePolicy(10000, 500, None)
    assert(!none.isThrottled("anything"))
    intercept[IllegalArgumentException](ThrottlePolicy(1, 1, None, triggerRatio = 0))
  }
}
