package graft.ops

import graft.SparkSuite
import graft.filter.{FilterChain, FilterSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions.col

/**
 * Proof for the table-backed skip-list (the at-scale KeyFilter path,
 * reference sideline/recipes/trigger/KeyFilter.java:36-50) and its
 * [[FilterSpec.KeyInTable]] wiring through [[FilterChain]]:
 *
 *  - NULL truth-table parity with the literal [[FilterSpec.KeyIn]]
 *    (anti keeps NULL-field rows, semi excludes them);
 *  - firehose ∪ sideline ≡ input, disjoint — the invariant every chain
 *    step must preserve or rows are lost/duplicated across the split;
 *  - annotate form is never-NULL and duplicate keys in the backing
 *    table do not duplicate annotated rows;
 *  - plan shape: the anti path is a BroadcastHashJoin LeftAnti with the
 *    key relation (not the log) on the build side;
 *  - join-backed specs refuse the scalar Column path loudly.
 */
class SkipListSuite extends SparkSuite {
  import FilterSpec.{KeyIn, KeyInTable}

  private val baseDir = java.nio.file.Files.createTempDirectory("skiplist-suite")
  private val dirSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def tmpDir(): String =
    baseDir.resolve(s"keys-${dirSeq.incrementAndGet()}").toString

  override def afterAll(): Unit = {
    // Best-effort recursive delete of the suite's fixture dirs.
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    try rm(baseDir) catch { case _: Exception => () }
    super.afterAll()
  }

  /** key column with NULLs; id makes row identity visible. */
  private def input: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("c")), (5L, Some("a")), (6L, None), (7L, Some("d"))
    ).toDF("id", "key")
  }

  test("anti/semi/annotate NULL truth table matches literal KeyIn exactly") {
    val path = tmpDir()
    val keys = Seq("a", "c", "zzz-not-present")
    SkipList.write(spark, path, keys)
    val table = FilterChain.empty.withStep("s", KeyInTable("key", path))
    val literal = FilterChain.empty.withStep("s", KeyIn("key", keys))
    val df = input

    def ids(d: DataFrame): Seq[Long] =
      d.select("id").collect().map(_.getLong(0)).toSeq.sorted

    // Firehose side: NULL key is KEPT by both forms.
    val keptTable = ids(table.applyKeep(df))
    val keptLiteral = ids(literal.applyKeep(df))
    assert(keptTable === keptLiteral)
    assert(keptTable === Seq(2L, 3L, 6L, 7L))

    // Sideline side: NULL key is EXCLUDED by both forms.
    val sideTable = ids(table.applySidelined("s", df))
    val sideLiteral = ids(literal.applySidelined("s", df))
    assert(sideTable === sideLiteral)
    assert(sideTable === Seq(1L, 4L, 5L))

    // Verdict column: identical values, never NULL, in both forms.
    val annTable = table.annotateDrop(df, "d").select("id", "d")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val annLiteral = literal.annotateDrop(df, "d").select("id", "d")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(annTable === annLiteral)
    assert(annTable === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true, 6L -> false, 7L -> false))
  }

  test("firehose ∪ sideline is exactly the input, disjoint") {
    val path = tmpDir()
    SkipList.write(spark, path, Seq("a", "d"))
    val chain = FilterChain.empty.withStep("s", KeyInTable("key", path))
    val df = input
    val kept = chain.applyKeep(df).select("id")
    val sidelined = chain.applySidelined("s", df).select("id")
    assert(kept.intersect(sidelined).count() === 0L)
    assert(kept.union(sidelined).orderBy("id").collect().map(_.getLong(0)).toSeq
      === (1L to 7L))
  }

  test("duplicate keys in the backing table do not duplicate annotated rows") {
    val path = tmpDir()
    SkipList.write(spark, path, Seq("a", "a", "a", "b"))
    val df = input
    val ann = SkipList(path).annotateMatch(df, col("key"), "hit")
    assert(ann.count() === df.count())
    assert(ann.filter(col("hit")).count() === 3L) // ids 1, 2, 5
  }

  test("mixed chain: scalar steps stay one conjunction, join step applies after") {
    import org.json4s.JInt
    val path = tmpDir()
    SkipList.write(spark, path, Seq("a"))
    val chain = FilterChain.empty
      .withStep("scalar", FilterSpec.FieldCmp("id", "ge", JInt(7)))
      .withStep("table", KeyInTable("key", path))
    val kept = chain.applyKeep(input).select("id")
      .collect().map(_.getLong(0)).toSeq.sorted
    // drops: id>=7 (7) and key='a' (1,5) → keeps 2,3,4,6
    assert(kept === Seq(2L, 3L, 4L, 6L))
    // Verdict column ORs both families.
    val ann = chain.annotateDrop(input, "d")
    assert(ann.filter(col("d")).select("id").collect().map(_.getLong(0)).toSeq.sorted
      === Seq(1L, 5L, 7L))
  }

  test("anti path plans as BroadcastHashJoin LeftAnti with keys on build side") {
    val path = tmpDir()
    SkipList.write(spark, path, Seq("a"))
    val chain = FilterChain.empty.withStep("s", KeyInTable("key", path))
    val df = chain.applyKeep(input)
    df.collect() // finalize AQE
    // QueryStageExec is a LEAF in the adaptive plan, so SparkPlan.collect
    // never descends into materialized stages; recurse through them by hand.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    // shared AQE-aware walk (SparkSuite.flattenPlan)
    val plan = df.queryExecution.executedPlan
    val bhjs = flattenPlan(plan).collect { case b: BroadcastHashJoinExec => b }
    assert(bhjs.nonEmpty, plan.toString.take(3000))
    val anti = bhjs.filter(_.joinType.toString == "LeftAnti")
    assert(anti.nonEmpty, s"expected LeftAnti, got ${bhjs.map(_.joinType)}")
    // Build side must be the broadcast (key) side, not the log.
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    anti.foreach { j =>
      val buildPlan = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      assert(buildPlan.toString.contains("Exchange") || buildPlan.toString.contains("Broadcast"),
        buildPlan.toString.take(1000))
    }
  }

  test("KeyInTable JSON round-trips and refuses the scalar Column path") {
    val spec = KeyInTable("key", "/some/warehouse/skiplist")
    assert(FilterSpec.fromJson(spec.toJson) === spec)
    intercept[UnsupportedOperationException](spec.dropColumn)
    // And therefore cannot be nested: Not(KeyInTable).dropColumn must throw
    intercept[UnsupportedOperationException](FilterSpec.Not(spec).dropColumn)
  }
}
