// (seeded-fuzz roundtrip test appended below — offline env has no
// scalacheck-plus, so deterministic seeded generation stands in)
package graft.filter

import graft.SparkSuite
import org.json4s.{JInt, JString}

class FilterSpecSuite extends SparkSuite {
  import FilterSpec._

  private val specs: Seq[FilterSpec] = Seq(
    KeyIn("key", Seq("tenant-3", "tenant-7")),
    FieldEq("user_id", JInt(3)),
    FieldCmp("value", "lt", JInt(0)),
    FieldCmp("value", "ge", JInt(10)),
    Not(KeyIn("key", Seq("a"))),
    FieldRegex("key", "^tenant-[0-9]+$"),
    AnyOf(Seq(FieldEq("k", JString("x")), DropAll)),
    AllOf(Seq(FieldCmp("v", "gt", JInt(1)), FieldCmp("v", "le", JInt(9)))),
    DropAll,
    DropNone,
    Raw("user_id % 2 = 0"))

  test("JSON roundtrip is identity for every spec shape") {
    specs.foreach { s =>
      assert(FilterSpec.fromJson(s.toJson) === s, s.toJson)
    }
  }

  test("drop semantics: KeyIn drops listed keys only") {
    import spark.implicits._
    val df = Seq("tenant-1", "tenant-3", "tenant-7", "tenant-9").toDF("key")
    val chain = FilterChain.empty.withStep("s1", KeyIn("key", Seq("tenant-3", "tenant-7")))
    val kept = df.filter(chain.keep).as[String].collect().sorted
    assert(kept === Array("tenant-1", "tenant-9"))
    val sidelined = df.filter(chain.sidelined("s1")).as[String].collect().sorted
    assert(sidelined === Array("tenant-3", "tenant-7"))
  }

  test("Not inverts; chain of many steps drops union of matches") {
    import spark.implicits._
    val df = (1 to 10).toDF("user_id")
    val chain = FilterChain.empty
      .withStep("a", FieldEq("user_id", JInt(3)))
      .withStep("b", FieldCmp("user_id", "ge", JInt(9)))
    val kept = df.filter(chain.keep).as[Int].collect().sorted
    assert(kept === Array(1, 2, 4, 5, 6, 7, 8))
    // Negated step keeps only what it dropped
    val negated = df.filter(Not(FieldEq("user_id", JInt(3))).dropColumn === false)
    assert(negated.as[Int].collect().sorted === Array(3))
  }

  test("FieldRegex: find semantics, NULL field kept on firehose / excluded from replay") {
    import spark.implicits._
    val df = Seq(Some("tenant-12"), Some("tenant-7"), Some("x-tenant-12-y"),
      None, Some("other")).toDF("key")
    val chain = FilterChain.empty.withStep("p", FieldRegex("key", "tenant-1[0-9]"))
    // unanchored find: both tenant-12 forms drop; NULL keeps (KeyIn table)
    val kept = df.filter(chain.keep).as[Option[String]].collect().toSet
    assert(kept === Set(Some("tenant-7"), None, Some("other")))
    val sidelined = df.filter(chain.sidelined("p")).as[Option[String]].collect().toSet
    assert(sidelined === Set(Some("tenant-12"), Some("x-tenant-12-y")))
    // keep ∪ sideline ≡ input — the chain invariant with NULLs present
    assert(kept ++ sidelined === df.as[Option[String]].collect().toSet)
  }

  test("a 3000-step chain compiles and evaluates (balanced tree, no stack overflow)") {
    import spark.implicits._
    // a left-deep Or/And tree at this width overflows the stack in
    // Catalyst's column converter (same failure class the bounded-scan
    // join path fixes); the chain's balanced reduction keeps depth log2(n)
    val chain = (0 until 3000).foldLeft(FilterChain.empty)((c, i) =>
      c.withStep(f"s$i%04d", KeyIn("key", Seq(s"t$i"))))
    val df = Seq("t1", "t2999", "other").toDF("key")
    assert(df.filter(chain.keep).as[String].collect() === Array("other"))
    assert(df.filter(chain.dropColumn).count() === 2)
  }

  test("empty chain keeps everything; DropAll drops everything") {
    import spark.implicits._
    val df = (1 to 5).toDF("x")
    assert(df.filter(FilterChain.empty.keep).count() === 5)
    assert(df.filter(FilterChain.empty.withStep("z", DropAll).keep).count() === 0)
  }

  test("filter predicate is pushed into the parquet scan") {
    val df = graft.Tables.events(spark, sfDir)
    val chain = FilterChain.empty.withStep("s", KeyIn("event_type", Seq("click")))
    val plan = df.filter(chain.keep).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("event_type"), plan)
  }

  test("seeded fuzz: random nested spec trees survive the JSON roundtrip") {
    import org.json4s.{JBool, JDouble, JInt, JString}
    val rnd = new scala.util.Random(20260812L)
    def leaf(): FilterSpec = rnd.nextInt(6) match {
      case 0 => FilterSpec.KeyIn(s"f${rnd.nextInt(5)}",
        Seq.fill(1 + rnd.nextInt(4))(s"k${rnd.nextInt(100)}"))
      case 1 => FilterSpec.FieldEq(s"f${rnd.nextInt(5)}", JInt(rnd.nextInt(1000)))
      case 2 => FilterSpec.FieldCmp(s"f${rnd.nextInt(5)}",
        Seq("lt", "le", "gt", "ge")(rnd.nextInt(4)), JDouble(rnd.nextDouble()))
      case 3 => FilterSpec.FieldEq("flag", JBool(rnd.nextBoolean()))
      case 4 => FilterSpec.Raw(s"f${rnd.nextInt(5)} IS NOT NULL")
      case _ => FilterSpec.FieldEq("s", JString(s"v${rnd.nextInt(50)}"))
    }
    def tree(depth: Int): FilterSpec =
      if (depth == 0) leaf()
      else rnd.nextInt(5) match {
        case 0 => FilterSpec.Not(tree(depth - 1))
        case 1 => FilterSpec.AnyOf(Seq.fill(1 + rnd.nextInt(3))(tree(depth - 1)))
        case 2 => FilterSpec.AllOf(Seq.fill(1 + rnd.nextInt(3))(tree(depth - 1)))
        case 3 => if (rnd.nextBoolean()) FilterSpec.DropAll else FilterSpec.DropNone
        case _ => leaf()
      }
    (1 to 200).foreach { i =>
      val spec = tree(3)
      val back = FilterSpec.fromJson(spec.toJson)
      assert(back === spec, s"iteration $i: $spec")
      // and the re-serialized form is stable (codec is a fixpoint)
      assert(back.toJson === spec.toJson, s"iteration $i json")
    }
  }
}
