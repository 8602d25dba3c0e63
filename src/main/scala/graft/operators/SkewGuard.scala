package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Skew guard for banded self-joins — the candidate-generation shape shared
 * by every LSH/banding dedup and ANN-pairs operator in this repo
 * (`ann_lsh_pairs`, `dedup_simhash_pairs`, `dedup_minhash_pairs`,
 * `dedup_ngram_jaccard`, `dedup_embedding_cosine`).
 *
 * Problem: `a.join(b, "band").filter(id1 < id2)` hash-partitions by band,
 * so ONE hot band (boilerplate documents, a dense SRP cell) funnels into
 * ONE task doing |band|² work. Every sf0.1 check passes — and a 100 TB
 * corpus with a band holding 0.1% of rows never finishes. Reference
 * philosophy analogue: bounding the damage a hot source can do is exactly
 * the reference's ThrottledMessageBuffer
 * (dynamic/buffer/ThrottledMessageBuffer.java:73-328) — a per-key
 * throttle, re-expressed here as a per-bucket parallelism bound.
 *
 * Shape (all inside ONE physical plan — the banded input's exchange is
 * reused by every consumer, so the expensive per-row columns below it are
 * computed once):
 *
 *  1. occupancy pass: `groupBy(band).count()`, map-side combined — the
 *     shuffle carries (band, long) only;
 *  2. hot set = bands with count > cap, materialized at its OWN shuffle
 *     boundary (re-partitioned by band) so AQE sizes it at runtime and
 *     picks the annotate join accordingly: EMPTY (the skew-free common
 *     case) ⇒ the left-outer annotate is eliminated outright and the
 *     whole hot branch constant-folds away — the guard's cold path decays
 *     to the occupancy agg alone; small ⇒ runtime broadcast, exactly the
 *     classic plan; degenerate (a pathological hash or near-constant
 *     bands can push |hot| toward rows/cap — multi-GB, NOT broadcastable)
 *     ⇒ a co-partitioned shuffle join on band with no corpus reshuffle
 *     (both sides already hash-partitioned by band). Nothing is ever
 *     force-broadcast, so no driver OOM exists in any regime, and the
 *     chosen shape is observable in the executed plan;
 *  3. COLD bands (the overwhelming majority): the existing shuffle-hash
 *     self-join on band — plan unchanged;
 *  4. HOT bands: triangle decomposition. Members are split into
 *     `nsalt = min(maxSalt, ceil(n/cap))` groups by a deterministic hash
 *     of the id; each row is replicated to the `nsalt` cells
 *     {(min(g,k), max(g,k)) : k < nsalt} and the self-join key becomes
 *     (band, cell). A pair with groups (g1, g2) collides in EXACTLY one
 *     kept cell — (min(g1,g2), max(g1,g2)) — enforced by the post-join
 *     cell-identity filter, so the output multiset is identical to the
 *     plain join. Per-cell membership is ≤ 2·ceil(n/nsalt), so per-task
 *     candidate work is bounded by ~4·(n/nsalt)² ≈ 4·cap² (independent of
 *     |band|) until nsalt saturates at maxSalt, after which replication
 *     cost (nsalt× the hot rows) stops growing and per-task work degrades
 *     gracefully to (2n/maxSalt)². No silent caps: the salted path counts
 *     its pairs through an observable metric (`skew_guard.salted_pairs`).
 *
 * The output of [[pairs]] is row-for-row (as a multiset) what the naive
 * join produces: `band` plus every other input column suffixed `_1`/`_2`,
 * filtered to `id_1 < id_2`. A pair sharing k bands still appears k times;
 * callers `distinct()` downstream exactly as before, so DuckDB oracles are
 * untouched.
 */
object SkewGuard {

  /** Max bucket occupancy served by the plain per-band join. 1024 keeps a
    * single cold task under ~0.5M candidate probes even when the per-pair
    * verify is expensive (array_intersect). */
  val DefaultCap = 1024

  /** Replication bound for the salted path: a hot row is shuffled at most
    * this many times, whatever the bucket size. */
  val DefaultMaxSalt = 64

  /** The explicit parallelism for pair-mass stages — the pair joins
    * inside [[pairs]], and the caller-side stages that CONSUME raw
    * candidate pairs (their distincts and verify fetches run at
    * `spark.sql.shuffle.partitions` otherwise, which re-funnels the
    * quadratic mass the join just spread out). Cluster-derived, so it
    * scales with executors, not with a config constant. */
  def pairParallelism(s: org.apache.spark.sql.SparkSession): Int =
    4 * s.sparkContext.defaultParallelism

  private val obsSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private val N = "__sg_n"
  private val NSalt = "__sg_nsalt"
  private val Grp = "__sg_grp"
  private val Cell = "__sg_cell"
  private val G1 = "__sg_g1"
  private val G2 = "__sg_g2"

  /** All within-band pairs of `banded` (columns: `band` + payload), as
    * `band`, `<payload>_1`, `<payload>_2` with `idCol_1 < idCol_2` — the
    * exact multiset of the naive band self-join, skew-guarded as per the
    * class doc. For exchange reuse, pass `banded` already
    * `.repartition(col("band"))`-ed (all five call sites do).
    *
    * @param observation optional [[Observation]] attached to the salted
    *   branch (tests); production plans always carry a named
    *   `skew_guard_<n>` observation (unique per call — one plan may guard
    *   several banded joins), visible via `QueryExecution
    *   .observedMetrics` / listeners. */
  def pairs(
      banded: DataFrame,
      idCol: String,
      cap: Int = DefaultCap,
      maxSalt: Int = DefaultMaxSalt,
      observation: Option[Observation] = None): DataFrame = {
    require(cap > 0 && maxSalt > 1, s"bad skew-guard params: cap=$cap maxSalt=$maxSalt")
    val payload = banded.columns.filter(_ != "band").toSeq
    def suffixed(df: DataFrame, suffix: String): DataFrame =
      df.select(df.columns.map {
        case c if payload.contains(c) => col(c).as(c + suffix)
        case c => col(c)
      }.toIndexedSeq: _*)

    // (1)+(2): occupancy over the reused band exchange. The explicit
    // repartition puts the hot set behind a stage boundary of its own, so
    // AQE sees its TRUE size before planning the annotate join: empty ⇒
    // join eliminated (hot branch folds away), small ⇒ runtime broadcast,
    // degenerate ⇒ co-partitioned join, never a forced broadcast.
    val hot = banded.groupBy("band").agg(count(lit(1)).as(N))
      .filter(col(N) > cap)
      .repartition(col("band"))
    val ann = banded.join(hot, Seq("band"), "left")

    // Pair-stage parallelism FLOOR (the EntityResolution.pairParallelism
    // lesson, re-measured by the r16 ×10 sweep): the pair joins' cost is
    // quadratic in band occupancy while their INPUT bytes are tiny, so
    // AQE's byte-based coalescing squeezes the exchange (16 tasks were
    // observed carrying 94M candidate pairs — 4.5 GB of sort spill on a
    // zero-spill plan). An explicit count makes the exchange
    // REPARTITION_BY_NUM, which AQE never coalesces; 4× cores scales
    // with the cluster. ONE repartition below the suffixed projections
    // keeps the two join sides reading the SAME exchange (ReusedExchange).
    val pairP = pairParallelism(banded.sparkSession)

    // (3) cold: the pre-guard plan, at the explicit pair parallelism.
    val cold = ann.filter(col(N).isNull).drop(N)
      .repartition(pairP, col("band"))
    val coldPairs = suffixed(cold, "_1")
      .join(suffixed(cold, "_2").hint("shuffle_hash"), Seq("band"))
      .filter(col(idCol + "_1") < col(idCol + "_2"))

    // (4) hot: triangle cells over deterministically-hashed groups.
    val hotBase = ann.filter(col(N).isNotNull)
      .withColumn(NSalt,
        least(lit(maxSalt), ceil(col(N) / lit(cap.toDouble))).cast("int"))
      .drop(N)
      .withColumn(Grp, pmod(xxhash64(col(idCol)), col(NSalt)).cast("int"))
      .withColumn(Cell, explode(transform(
        sequence(lit(0), col(NSalt) - 1),
        k => least(col(Grp), k) * col(NSalt) + greatest(col(Grp), k))))
      .repartition(pairP, col("band"), col(Cell))
    val hotA = suffixed(hotBase, "_1").withColumnRenamed(Grp, G1)
    val hotB = suffixed(hotBase, "_2").withColumnRenamed(Grp, G2)
      .drop(NSalt)
    val hotPairsRaw = hotA
      .join(hotB.hint("shuffle_hash"), Seq("band", Cell))
      .filter(col(idCol + "_1") < col(idCol + "_2"))
      // exactly-once: keep the pair only in its own (min, max) group cell
      .filter(least(col(G1), col(G2)) * col(NSalt) +
        greatest(col(G1), col(G2)) === col(Cell))
      .drop(Cell, G1, G2, NSalt)
    val saltedMetrics = Seq(
      count(lit(1)).as("salted_pairs"),
      approx_count_distinct(col("band")).as("hot_bands"))
    val hotPairs = observation match {
      case Some(obs) => hotPairsRaw.observe(obs, saltedMetrics.head, saltedMetrics.tail: _*)
      // per-call unique suffix: one plan may guard several banded joins
      // (e.g. the cluster query unions three pairs families), and Spark
      // rejects duplicate observation names with differing results
      case None => hotPairsRaw.observe(s"skew_guard_${obsSeq.incrementAndGet()}",
        saltedMetrics.head, saltedMetrics.tail: _*)
    }

    coldPairs.unionByName(hotPairs)
  }

  /** The salted branch's exploded frame (band, cell, payload, groups) —
    * exposed for the skew suite to assert the per-cell occupancy bound
    * without duplicating the salting arithmetic. */
  private[operators] def saltedCells(
      banded: DataFrame, idCol: String, cap: Int, maxSalt: Int): DataFrame = {
    val hot = banded.groupBy("band").agg(count(lit(1)).as(N))
      .filter(col(N) > cap)
      .repartition(col("band"))
    banded.join(hot, Seq("band"), "left")
      .filter(col(N).isNotNull)
      .withColumn(NSalt,
        least(lit(maxSalt), ceil(col(N) / lit(cap.toDouble))).cast("int"))
      .withColumn(Grp, pmod(xxhash64(col(idCol)), col(NSalt)).cast("int"))
      .withColumn(Cell, explode(transform(
        sequence(lit(0), col(NSalt) - 1),
        k => least(col(Grp), k) * col(NSalt) + greatest(col(Grp), k))))
      .select(col("band"), col(Cell).as("cell"), col(NSalt).as("nsalt"))
  }
}
