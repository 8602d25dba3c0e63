package graft.engine

import graft.SparkSuite
import graft.filter.FilterSpec
import graft.sideline.{SidelineRequest, SidelineType}
import graft.sources.ParquetEventLog
import org.apache.spark.sql.functions._

/** Full lifecycle over real testdata — the reference's E2E scenario
  * (SidelineSpoutTest.java:93-768) minus Storm: firehose ∪ sideline must
  * reconstruct the log exactly, disjointly, across every transition. */
class SidelineEngineSuite extends SparkSuite {

  private def newEngine = SidelineEngine.inMemory(ParquetEventLog(sfDir, 4))

  test("START installs drop filter; firehose excludes sidelined keys") {
    val e = newEngine
    e.start(SidelineRequest("r1", FilterSpec.KeyIn("key", Seq("3", "7"))), spark)
    val fh = e.firehose(spark)
    assert(fh.filter(col("key").isin("3", "7")).count() === 0)
    assert(fh.count() > 0)
    // start twice is rejected
    intercept[IllegalArgumentException] {
      e.start(SidelineRequest("r1", FilterSpec.DropAll), spark)
    }
  }

  test("replay before RESUME is illegal; RESUME replays only dropped rows") {
    val e = newEngine
    e.start(SidelineRequest("r1", FilterSpec.KeyIn("key", Seq("3"))), spark)
    intercept[IllegalArgumentException](e.sidelineReplay("r1", spark))
    e.resume("r1")
    val replay = e.sidelineReplay("r1", spark)
    // Start snapshot == full current state => empty window (nothing after it)
    assert(replay.count() === 0)
  }

  test("lifecycle parity: firehose ∪ sideline ≡ window, disjoint") {
    import graft.model.{ConsumerPartition, ConsumerState}
    val log = ParquetEventLog(sfDir, 4)
    val e = SidelineEngine.inMemory(log)
    // Pretend the firehose had processed up to offset 49 per partition when
    // the sideline started: rewrite the snapshot to mid-log.
    e.start(SidelineRequest("r1", FilterSpec.KeyIn("key", Seq("3", "7"))), spark)
    val p0 = e.store.retrieve("r1").get
    val mid = ConsumerState(p0.startingState.offsets.map { case (cp, _) => cp -> 49L })
    e.store.persist(p0.copy(startingState = mid))
    e.resume("r1")
    // Firehose AS SEEN WHILE THE SIDELINE IS ACTIVE (chain includes r1):
    // the Column is baked at construction, like a micro-batch's plan.
    val fhDuring = e.firehose(spark, from = mid)
    e.resolve("r1", spark)
    val sl = e.sidelineReplay("r1", spark)
    val window = log.readBounded(spark, mid,
      e.store.retrieve("r1").get.endingState)
    val ids = (df: org.apache.spark.sql.DataFrame) => df.select("partition", "offset")
    // parity invariant over the sideline window [mid, end)
    assert(ids(fhDuring).count() + ids(sl).count() === ids(window).count())
    assert(ids(fhDuring).intersect(ids(sl)).count() === 0)
    assert(ids(fhDuring).union(ids(sl)).except(ids(window)).count() === 0)
    // after RESOLVE the firehose drops nothing: new rows flow again
    val fhAfter = e.firehose(spark, from = mid)
    assert(fhAfter.filter(col("key").isin("3", "7")).count() ===
      window.filter(col("key").isin("3", "7")).count())

    // completion cleanup is idempotent
    e.complete("r1"); e.complete("r1")
    assert(e.loadSidelines().isEmpty)
  }

  test("recovery: engine rebuilt over same store sees identical chain") {
    val log = ParquetEventLog(sfDir, 4)
    val store = new graft.sideline.InMemoryControlStore
    val e1 = new SidelineEngine(log, store)
    e1.start(SidelineRequest("a", FilterSpec.FieldEq("event_type",
      org.json4s.JString("error"))), spark)
    e1.start(SidelineRequest("b", FilterSpec.KeyIn("key", Seq("5"))), spark)
    e1.resume("a")
    // new engine instance (simulated restart) — loadSidelines = reference
    // SidelineSpoutHandler.loadSidelines:227-322
    val e2 = new SidelineEngine(log, store)
    assert(e2.loadSidelines().map(p => p.id -> p.sidelineType).sortBy(_._1) ===
      Seq("a" -> SidelineType.Resume, "b" -> SidelineType.Start))
    assert(e2.activeChain().steps.keySet === Set("a", "b"))
    // resolving "a" removes it from the active chain but keeps the payload
    e2.resolve("a", spark)
    assert(e2.activeChain().steps.keySet === Set("b"))
  }
}
