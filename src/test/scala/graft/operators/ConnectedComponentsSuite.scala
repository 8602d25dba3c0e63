package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/**
 * Connected components (the transitive-dedup clustering primitive):
 * exact agreement with a driver-side union-find on seeded random graphs,
 * convergence/bound semantics, and the scale contract — after the first
 * round, one shuffle per iteration, carrying (id, label) only.
 */
class ConnectedComponentsSuite extends SparkSuite {

  private def verticesDf(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  private def edgesDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  /** Driver-side union-find oracle. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def labelsMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Distributed-loop runner: threshold 0 disables the metadata-sized
    * local union-find fallback, so every suite graph (all far below the
    * production threshold) keeps pinning the ITERATIVE plan. The local
    * path has its own agreement tests below. */
  private def runD(vertices: DataFrame, edges: DataFrame,
      maxIters: Int = 25): ConnectedComponents.Result =
    ConnectedComponents.run(vertices, "doc_id", edges, "a", "b",
      maxIters = maxIters, localEdgeThreshold = 0)

  test("chain + cycle + singleton resolve to min-id components") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (6L, 7L), (7L, 8L), (8L, 6L), // cycle 6-7-8
      (9L, 9L)) // self-loop, ignored
    val r = runD(verticesDf(10), edgesDf(edges))
    assert(r.converged)
    assert(labelsMap(r.labels) === Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 9L))
  }

  test("matches union-find on a seeded random graph (duplicates included)") {
    val n = 200
    val rnd = new scala.util.Random(42)
    // ~1.2 edges/vertex: many non-trivial components, some long chains
    val edges = Seq.fill(240)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val dup = edges ++ edges.take(50) ++ edges.take(20).map(_.swap)
    val r = runD(verticesDf(n), edgesDf(dup))
    assert(r.converged)
    assert(labelsMap(r.labels) === unionFind(n, edges))
  }

  test("no edges: every vertex is its own component, one round to converge") {
    val r = runD(verticesDf(5), edgesDf(Seq.empty))
    assert(r.converged && r.iterations === 1)
    assert(labelsMap(r.labels) === (0L until 5L).map(i => i -> i).toMap)
  }

  test("maxIters bounds the loop and reports non-convergence loudly") {
    // a 7-hop path needs ~6 propagation rounds; 2 cannot finish
    val chain = (0L until 7L).sliding(2).map(s => (s(0), s(1))).toSeq
    val r = runD(verticesDf(7), edgesDf(chain), maxIters = 2)
    assert(!r.converged && r.iterations === 2)
    // partial labels are a REFINEMENT: never cross components, and all
    // labels are valid component members (monotone toward the fixpoint)
    val partial = labelsMap(r.labels)
    partial.foreach { case (id, lbl) => assert(lbl <= id && lbl >= 0L) }
    // the same graph converges exactly when given enough rounds
    val full = runD(verticesDf(7), edgesDf(chain))
    assert(full.converged)
    assert(labelsMap(full.labels) === (0L until 7L).map(i => i -> 0L).toMap)
  }

  test("steady-state round: one edge-sized shuffle + one label-sized shuffle, longs only") {
    // the 100 TB contract: edges are cached pre-partitioned by src, labels
    // arrive partitioned by id from the previous round's aggregate, so the
    // propagation join realigns nothing — the min-label aggregate is the
    // only edge-proportional exchange; the pointer-jump self-join adds one
    // label-table-sized exchange. Every shuffled row is two longs.
    val n = 100
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edgesDf(edges)
    val sym = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct().repartition(col("src")).cache()
    val labels0 = verticesDf(n)
      .select(col("doc_id").as("id"), col("doc_id").as("label"))
      .localCheckpoint(true)
    // shared AQE-aware walk (SparkSuite.flattenPlan)
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
      flattenPlan(p).collect { case s: ShuffleExchangeExec => s }
    // round 1 output = what run() feeds every later round
    val l1 = ConnectedComponents.shortcut(
      ConnectedComponents.step(labels0, sym)).localCheckpoint(true)
    // propagate alone: exactly ONE exchange
    val prop = ConnectedComponents.step(l1, sym)
    prop.collect()
    val propEx = shuffles(prop.queryExecution.executedPlan)
    assert(propEx.size === 1, prop.queryExecution.executedPlan.toString.take(4000))
    // full round (propagate + shortcut): the shortcut adds one label-sized
    // exchange; AQE may insert one more re-alignment when it locally
    // downgrades the propagate join to broadcast (test-size artifact).
    // The scale invariant is the payload: every shuffled row is two longs.
    val round = ConnectedComponents.shortcut(ConnectedComponents.step(l1, sym))
    round.collect()
    val ex = shuffles(round.queryExecution.executedPlan)
    assert(ex.size <= 3, round.queryExecution.executedPlan.toString.take(4000))
    ex.foreach { e =>
      val out = e.child.output
      assert(out.size === 2 &&
        out.forall(_.dataType == org.apache.spark.sql.types.LongType),
        out.mkString(","))
    }
    sym.unpersist()
  }

  test("edges through non-vertex ids: transitivity intact, output restricted to vertices") {
    // edges may reference ids outside the vertex relation (e.g. claimed
    // embedding ids). They must CONDUCT connectivity — and the sum
    // convergence test must stay sound even though they add label rows
    // (they are seeded up front; a lazily-appearing row could cancel a
    // propagation decrease and fake convergence at a non-fixpoint).
    val vertices = {
      import spark.implicits._
      Seq(7L, 57L, 93L, 150L, 300L).toDF("doc_id")
    }
    val edges = edgesDf(Seq(
      (57L, 40L), (40L, 30L), (30L, 20L), (20L, 7L), // chain via non-vertices
      (300L, 150L), (150L, 93L))) // a second component shrinking in parallel
    val r = runD(vertices, edges)
    assert(r.converged)
    val labels = labelsMap(r.labels)
    // output rows are EXACTLY the vertices — seeded endpoints are cut
    assert(labels.keySet === Set(7L, 57L, 93L, 150L, 300L))
    // transitivity flowed through 40-30-20 even though none is a vertex
    assert(labels(57L) === 7L && labels(7L) === 7L)
    assert(labels(300L) === 93L && labels(150L) === 93L && labels(93L) === 93L)
  }

  test("empty vertex relation converges to an empty result, no crash") {
    // sum(label) over zero rows is NULL — the convergence compare must read
    // (0, null) == (0, null) as the fixpoint it is (a fully-filtered-out
    // documents table is a legitimate input), not throw
    val r = runD(verticesDf(0), edgesDf(Seq((1L, 2L))))
    assert(r.converged)
    assert(r.labels.count() === 0L)
    // and with edges empty too (both relations empty)
    val r2 = runD(verticesDf(0), edgesDf(Seq.empty))
    assert(r2.converged && r2.labels.count() === 0L)
  }

  test("giant boilerplate cluster (star) resolves in O(1) rounds") {
    // the real-world hot case: thousands of exact/near dups of one
    // template form a single giant component of diameter 2
    val n = 5000
    val star = (1L until n.toLong).map(i => (0L, i))
    val r = runD(verticesDf(n), edgesDf(star))
    assert(r.converged && r.iterations <= 3, s"star took ${r.iterations} rounds")
    val labels = labelsMap(r.labels)
    assert(labels.values.forall(_ == 0L))
  }

  test("local path: below the threshold, labels agree with union-find and the distributed loop") {
    val n = 200
    val rnd = new scala.util.Random(99)
    val edges = Seq.fill(260)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // default threshold ⇒ this metadata-sized graph takes the driver
    // union-find path: exact, zero iterations, always converged
    val local = ConnectedComponents.run(
      verticesDf(n), "doc_id", edgesDf(edges), "a", "b")
    assert(local.converged && local.iterations === 0)
    assert(labelsMap(local.labels) === unionFind(n, edges))
    assert(labelsMap(local.labels) ===
      labelsMap(runD(verticesDf(n), edgesDf(edges)).labels))
  }

  test("local path: non-vertex endpoints conduct but never surface; empty inputs survive") {
    val vertices = { import spark.implicits._; Seq(7L, 57L).toDF("doc_id") }
    // 57 — 40 — 7: connected only through a non-vertex id
    val local = ConnectedComponents.run(
      vertices, "doc_id", edgesDf(Seq((57L, 40L), (40L, 7L))), "a", "b")
    assert(local.converged)
    assert(labelsMap(local.labels) === Map(7L -> 7L, 57L -> 7L))
    val empty = ConnectedComponents.run(
      verticesDf(0), "doc_id", edgesDf(Seq.empty), "a", "b")
    assert(empty.converged && empty.labels.count() === 0L)
  }

  private def runStar(vertices: DataFrame, edges: DataFrame,
      maxIters: Int = 25): ConnectedComponents.Result =
    ConnectedComponents.run(vertices, "doc_id", edges, "a", "b",
      maxIters = maxIters, localEdgeThreshold = 0, algorithm = "star")

  test("star contraction: a 10k-node path converges in O(log) rounds") {
    // the adversarial shape for propagation: diameter = n. Alternating
    // large-star/small-star contracts it geometrically — and each round
    // hands the next a SMALLER edge set, so the log rounds get cheaper
    // as they go (the property propagation lacks).
    val n = 10000
    val chain = (0L until n.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
    val r = runStar(verticesDf(n), edgesDf(chain))
    assert(r.converged, s"10k path did not converge in ${r.iterations} rounds")
    assert(r.iterations <= 16,
      s"expected ~log2(10000) rounds, got ${r.iterations}")
    assert(labelsMap(r.labels).values.forall(_ == 0L))
  }

  test("star contraction matches union-find on a seeded random graph") {
    val n = 200
    val rnd = new scala.util.Random(1234)
    val edges = Seq.fill(240)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val dup = edges ++ edges.take(40).map(_.swap)
    val r = runStar(verticesDf(n), edgesDf(dup))
    assert(r.converged)
    assert(labelsMap(r.labels) === unionFind(n, edges))
  }

  test("star contraction property sweep: 20 seeded graph shapes match union-find") {
    // paths, stars, cycles, dense blobs, sparse dust — every seed a
    // different mix; each must converge to exactly the union-find labels
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(60)
      val shape = seed % 4
      val edges: Seq[(Long, Long)] = shape match {
        case 0 => // path chunks
          (0L until n.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
            .filterNot(_ => rnd.nextInt(5) == 0)
        case 1 => // star + noise
          (1L until n.toLong).map(i => (0L, i)).filter(_ => rnd.nextBoolean()) ++
            Seq.fill(10)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        case 2 => // cycles
          (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
        case _ => // random sparse
          Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      }
      val clean = edges.filter { case (a, b) => a != b }
      val r = runStar(verticesDf(n), edgesDf(clean))
      assert(r.converged, s"seed $seed (shape $shape, n=$n) did not converge")
      assert(labelsMap(r.labels) === unionFind(n, clean),
        s"seed $seed (shape $shape, n=$n) labels diverged from union-find")
    }
  }

  test("star contraction: non-vertex conduction, empty inputs, maxIters refinement") {
    val vertices = { import spark.implicits._; Seq(7L, 57L, 93L).toDF("doc_id") }
    val viaNonVertex = edgesDf(Seq((57L, 40L), (40L, 30L), (30L, 7L), (93L, 93L)))
    val r = runStar(vertices, viaNonVertex)
    assert(r.converged)
    assert(labelsMap(r.labels) === Map(7L -> 7L, 57L -> 7L, 93L -> 93L))

    val empty = runStar(verticesDf(3), edgesDf(Seq.empty))
    assert(empty.converged && empty.iterations === 1)
    assert(labelsMap(empty.labels) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))

    // a 40-hop chain cannot finish in 2 rounds; the bail-out labels are
    // still a refinement (labels never cross components, never exceed id)
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val partial = runStar(verticesDf(40), edgesDf(chain), maxIters = 2)
    assert(!partial.converged && partial.iterations === 2)
    labelsMap(partial.labels).foreach { case (id, lbl) =>
      assert(lbl <= id && lbl >= 0L)
    }
  }

  test("star contraction forced bail-out is a refinement of the TRUE components") {
    // Two interleaved deep chains (even ids / odd ids) — two true
    // components whose node ranges overlap completely, so any label that
    // leaks across components is visible as a parity mismatch. A 2-round
    // cap cannot converge 40-hop chains; the contract on the bail-out
    // (ConnectedComponents.runStar's warn path) is REFINEMENT: every
    // label is a real node of the SAME true component, never above the
    // node's id, and the label relation only over-segments (nodes
    // sharing a partial label always share a true component — the
    // converse may not hold yet).
    val n = 80
    val evens = (0L until n.toLong by 2).sliding(2).map(s => (s(0), s(1))).toSeq
    val odds = (1L until n.toLong by 2).sliding(2).map(s => (s(0), s(1))).toSeq
    val truth = unionFind(n, evens ++ odds)
    val partial = runStar(verticesDf(n), edgesDf(evens ++ odds), maxIters = 2)
    assert(!partial.converged && partial.iterations === 2)
    val lm = labelsMap(partial.labels)
    assert(lm.keySet === (0L until n.toLong).toSet, "a bail-out must still label every vertex")
    lm.foreach { case (id, lbl) =>
      assert(lbl >= 0L && lbl < n.toLong, s"label $lbl of node $id is not a real node")
      assert(lbl <= id, s"label $lbl exceeds node id $id")
      assert(truth(lbl) === truth(id),
        s"label $lbl crossed true components for node $id (bail-out must only over-segment)")
    }
    // and the refinement tightens to the exact answer when the cap lifts
    val full = runStar(verticesDf(n), edgesDf(evens ++ odds))
    assert(full.converged && labelsMap(full.labels) === truth)
  }

  test("star round: every shuffled row is two longs (the 100 TB payload contract)") {
    val n = 300
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val canon = edgesDf(edges)
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    val round = ConnectedComponents.starRound(canon)
    round.collect()
    val ex = flattenPlan(round.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s }
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val out = e.child.output
      assert(out.size === 2 &&
        out.forall(_.dataType == org.apache.spark.sql.types.LongType),
        out.mkString(","))
    }
  }

  test("pointer jumping: a 60-hop chain converges within default maxIters") {
    // plain propagation needs 59 rounds (> default maxIters); once the
    // adaptive shortcut engages, reach doubles per round
    val n = 60
    val chain = (0L until n.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
    val r = runD(verticesDf(n), edgesDf(chain))
    assert(r.converged, s"chain did not converge in ${r.iterations} rounds")
    assert(r.iterations <= 12, s"expected ~shortcutAfter+log2(60) rounds, got ${r.iterations}")
    assert(labelsMap(r.labels).values.forall(_ == 0L))
  }
}
