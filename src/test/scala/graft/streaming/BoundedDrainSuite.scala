package graft.streaming

import graft.SparkSuite
import graft.engine.SidelineEngine
import graft.filter.FilterSpec
import graft.sideline.SidelineRequest
import graft.sources.FileLogSource
import org.apache.spark.sql.types.StructType

import java.nio.file.Files
import scala.collection.mutable

/** SL3 streaming semantics: after RESOLVE the resume stream becomes a
  * bounded drain that emits the window, self-stops when every partition
  * passes its ending offset, and fires the idempotent completion hook. */
class BoundedDrainSuite extends SparkSuite {

  test("resolve -> bounded drain: emits window only, self-stops, completes") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Files.createTempDirectory("graft-drain").toString
    val schema = StructType.fromDDL(
      "partition INT, offset LONG, key STRING, value STRING")
    def write(offs: Range): Unit =
      offs.map(o => (0, o.toLong, s"${o % 4}", s"v$o"))
        .toDF("partition", "offset", "key", "value")
        .write.mode("append").parquet(s"$dir/c${offs.head}")

    write(0 until 40)
    val log = FileLogSource(dir, schema)
    val engine = SidelineEngine.inMemory(log)
    engine.start(SidelineRequest("r", FilterSpec.KeyIn("key", Seq("3"))), spark)
    engine.resume("r")

    // more rows arrive while sidelined; then RESOLVE closes the window
    write(40 until 70)
    engine.resolve("r", spark) // ending = offset 69
    val p = engine.store.retrieve("r").get

    val got = mutable.ArrayBuffer.empty[Long]
    var completions = 0
    val replayStream = log.readStreamFrom(spark, p.startingState)
      .filter(p.step.dropColumn)
    val q = BoundedDrain.run(
      replayStream, p.endingState.get,
      sink = (df, _) => got.synchronized {
        got ++= df.select("offset").as[Long].collect()
      },
      onComplete = () => { completions += 1; engine.complete("r") })

    // rows past the bound arrive too — they must advance completion but
    // NOT be emitted
    write(70 until 90)
    q.awaitTermination(60000)
    assert(!q.isActive, "drain must stop itself once the window is passed")

    // emitted exactly: dropped-tenant rows in (start=39, end=69]
    val expected = (40 until 70).filter(_ % 4 == 3).map(_.toLong)
    assert(got.sorted === expected)
    // completion hook fired once; control row cleared (idempotent)
    assert(completions === 1)
    assert(engine.loadSidelines().isEmpty)
  }

  test("self-completion routes through coordinator lifecycle hooks (SL3 -> O5)") {
    val sparkS = spark
    import sparkS.implicits._
    import graft.engine.{EngineHooks, QueryCoordinator}
    val dir = Files.createTempDirectory("graft-drain2").toString
    val schema = StructType.fromDDL(
      "partition INT, offset LONG, key STRING, value STRING")
    (0 until 20).map(o => (0, o.toLong, s"${o % 2}", s"v$o"))
      .toDF("partition", "offset", "key", "value")
      .write.parquet(s"$dir/c0")

    val events = mutable.ArrayBuffer.empty[String]
    val hooks = new EngineHooks {
      override def onQueryStart(name: String): Unit = { events += s"start:$name"; () }
      override def onQueryCompletion(name: String): Unit = { events += s"done:$name"; () }
    }
    val coord = new QueryCoordinator(spark, 2, hooks)
    val log = FileLogSource(dir, schema)
    val ending = log.currentState(spark)
    coord.launch("drain-q") {
      BoundedDrain.run(
        log.readStreamFrom(spark),
        ending,
        sink = (_, _) => (),
        queryName = "drain-q",
        // the BoundedDrain completion hook reports back to the
        // coordinator, which deregisters and fires onQueryCompletion —
        // the reference's onVirtualSpoutCompletion wiring
        onComplete = () => coord.completed("drain-q"))
    }
    val deadline = System.nanoTime() + 30_000_000_000L
    while (!events.contains("done:drain-q") && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(events.toSeq === Seq("start:drain-q", "done:drain-q"))
    assert(coord.get("drain-q").isEmpty, "completed query must be deregistered")
    coord.close(2000)
  }
}
