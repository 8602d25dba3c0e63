package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Skew guard for banded self-joins (r3/r4 verdict #1): output parity with
 * the naive join on a skewed dataset (one band holding >30% of all rows),
 * bounded per-task candidate counts on the salted path, a zero-cost cold
 * path, and the observable split-bucket metric.
 */
class SkewGuardSuite extends SparkSuite {

  /** `n` rows; ids `0 until n`; one "HOT" band holding `hotShare` of the
    * rows, the rest scattered over 50 cold bands. Payload column `v`
    * proves payload columns ride through the guard. */
  private def skewed(n: Int, hotShare: Double): DataFrame = {
    import spark.implicits._
    val hotN = (n * hotShare).toInt
    (0 until n).map { id =>
      val band = if (id < hotN) "HOT" else s"cold-${id % 50}"
      (id.toLong, band, id.toLong * 2)
    }.toDF("id", "band", "v").repartition(col("band"))
  }

  private def naivePairs(banded: DataFrame): DataFrame = {
    val a = banded.select(col("band"), col("id").as("id_1"), col("v").as("v_1"))
    val b = banded.select(col("band"), col("id").as("id_2"), col("v").as("v_2"))
    a.join(b, "band").filter(col("id_1") < col("id_2"))
      .select("band", "id_1", "v_1", "id_2", "v_2")
  }

  private def normalized(df: DataFrame): DataFrame =
    df.select("band", "id_1", "v_1", "id_2", "v_2")

  test("guarded pairs ≡ naive join on a 35%-hot-band dataset (multiset parity)") {
    val banded = skewed(n = 900, hotShare = 0.35) // hot bucket: 315 rows
    val obs = Observation("sg_parity")
    val guarded = normalized(
      SkewGuard.pairs(banded, "id", cap = 40, maxSalt = 16, observation = Some(obs)))
    val naive = naivePairs(banded)
    assert(guarded.exceptAll(naive).isEmpty, "guarded emitted pairs naive does not")
    assert(naive.exceptAll(guarded).isEmpty, "guarded missed pairs")
    // the hot band REALLY took the salted path, and the metric says so
    val salted = obs.get("salted_pairs").asInstanceOf[Long]
    assert(salted == 315L * 314 / 2, s"expected all hot pairs salted, got $salted")
    assert(obs.get("hot_bands").asInstanceOf[Long] >= 1L)
  }

  test("same-group and cross-group hot pairs each appear exactly once") {
    // tiny hot bucket → collect and check no pair is duplicated or lost
    val banded = skewed(n = 120, hotShare = 0.5) // hot: 60 rows, nsalt=6 @cap=10
    val guarded = SkewGuard.pairs(banded, "id", cap = 10, maxSalt = 16)
      .filter(col("band") === "HOT").select("id_1", "id_2")
    val pairs = guarded.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 60 * 59 / 2, s"got ${pairs.length}")
    assert(pairs.distinct.length == pairs.length, "duplicated pair on the salted path")
  }

  test("per-cell membership (⇒ per-task candidate work) is bounded, independent of bucket size") {
    // one band with 3000 rows (~94% of all): naive = ONE task doing
    // 3000²/2 probes; guarded cells must each hold ≤ 2·ceil(n/nsalt)
    // members (+ hash-split variance), i.e. per-task work ~4·cap², 30×
    // smaller — the bound the 100 TB verdict requires.
    val banded = skewed(n = 3200, hotShare = 0.94)
    val loads = SkewGuard.saltedCells(banded, "id", cap = 100, maxSalt = 64)
      .groupBy("band", "cell").count()
    val maxMembers = loads.agg(max("count")).head().getLong(0)
    // nsalt = ceil(3008/100) = 31 → per-group ≈ 97; cross cells hold two
    // groups ≈ 194 expected; 320 allows 3σ hash-split variance
    assert(maxMembers <= 320, s"hot cell overloaded: $maxMembers members")
    // and the split is real: a 3008-row bucket never sits in one cell
    assert(maxMembers < 3008, "hot bucket was not split")
  }

  test("cold-only data takes the plain path: zero salted pairs, parity intact") {
    val banded = skewed(n = 400, hotShare = 0.0)
    val obs = Observation("sg_cold")
    val guarded = normalized(
      SkewGuard.pairs(banded, "id", cap = 1024, maxSalt = 16, observation = Some(obs)))
    val naive = naivePairs(banded)
    assert(guarded.exceptAll(naive).isEmpty && naive.exceptAll(guarded).isEmpty)
    assert(obs.get("salted_pairs").asInstanceOf[Long] == 0L)
  }

  test("degenerate near-constant bands survive with broadcasts disabled (hot set past any threshold)") {
    // r5 verdict #2: the hot-set broadcast was bounded only by rows/cap —
    // with a pathological hash or near-constant bands that is multi-GB.
    // The guard must not DEPEND on broadcasting: with the broadcast
    // threshold off (simulating |hot| past any threshold), the annotate
    // must fall back to the co-partitioned join and stay correct.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      // EVERY band hot: 3 near-constant bands over 300 rows at cap=10
      val banded = (0 until 300).map(id => (id.toLong, s"b${id % 3}", id.toLong))
        .toDF("id", "band", "v").repartition(col("band"))
      val guarded = normalized(SkewGuard.pairs(banded, "id", cap = 10, maxSalt = 8))
      val naive = naivePairs(banded)
      assert(guarded.exceptAll(naive).isEmpty && naive.exceptAll(guarded).isEmpty)
      guarded.collect()
      val p = guarded.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
        p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skew-free data short-circuits the annotate: AQE eliminates the hot branch") {
    // the guard's cold-path premium (r5 verdict #3): once the runtime-
    // sized hot set materializes EMPTY, AQE must drop the left-outer
    // annotate and the salted lineage wholesale — the executed plan decays
    // to occupancy agg + the plain candidate join.
    val banded = skewed(n = 400, hotShare = 0.0)
    val df = SkewGuard.pairs(banded, "id", cap = 1024, maxSalt = 16)
    df.collect()
    // AQE's toString appends the pre-execution "Initial Plan"; judge the
    // final plan section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("EmptyRelation"), p.take(3000)) // hot set proven empty
    assert(!p.contains("LeftOuter"), p.take(3000)) // annotate join gone
    assert(!p.contains("Generate"), p.take(3000)) // salted explode gone
  }

  test("guard plan: corpus joins stay shuffle-hash; only the band-count relation broadcasts") {
    val banded = skewed(n = 900, hotShare = 0.35)
    val df = SkewGuard.pairs(banded, "id", cap = 40, maxSalt = 16)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    // every broadcast join is the occupancy annotate, keyed on band
    val bhjLines = p.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq
    assert(bhjLines.nonEmpty && bhjLines.forall(_.contains("[band#")), bhjLines.mkString("\n"))
  }
}
