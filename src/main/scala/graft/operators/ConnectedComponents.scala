package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over a pair list — the transitive
 * closure that turns pairwise near-dup verdicts into dedup CLUSTERS.
 *
 * Why it exists: every pairs operator in this repo (`dedup_ngram_jaccard`,
 * `dedup_simhash_pairs`, `dedup_embedding_cosine`) emits VERIFIED PAIRS,
 * and a greedy lowest-id-keeper over pairs both over-drops (B dropped for
 * A, C dropped for B, but C~A was never verified) and under-drops (A~B and
 * B~C chains keep C when the whole chain is one template family). A real
 * training-data dedup resolves the *component* as one unit — the same
 * philosophy as the reference resolving a sideline as one related set
 * rather than record-at-a-time
 * (sideline/handler/SidelineSpoutHandler.java:488-537).
 *
 * Algorithm: iterative min-label propagation with ADAPTIVE POINTER
 * JUMPING. Each vertex starts labeled with itself; each round every
 * vertex takes the min of its own label and its neighbors' labels
 * (propagate). Propagation alone needs `diameter` rounds — the cheapest
 * possible round, and enough for the shallow template families that
 * dominate real corpora. If the graph is still unconverged after
 * `shortcutAfter` rounds (a deep chain of drifting templates), every
 * further round also replaces each label with its label's label
 * (shortcut — labels are always real vertex ids, so the lookup is a
 * self-join of the label table), doubling reach per round: a 1000-hop
 * chain resolves in ~13 rounds instead of 1000. Bounded by `maxIters`
 * with an explicit convergence verdict — never a silent cap.
 *
 * 100 TB shape, per iteration:
 *  - the symmetrized edge list is computed ONCE, hash-partitioned by
 *    `src`, and cached — iterations reuse the exchange via the cache;
 *  - labels arrive partitioned by id (the previous iteration's groupBy
 *    output, preserved through `localCheckpoint`), so the edges⋈labels
 *    join needs NO new exchange on either side;
 *  - per iteration, the edge-proportional work shuffles ONCE (the
 *    min-label aggregate, map-side combined); once engaged, the shortcut
 *    adds one label-table-sized exchange (vertex-proportional, strictly
 *    smaller). Everything shuffled is (id, long) — never document
 *    content (ConnectedComponentsSuite pins this with a plan assert);
 *  - `localCheckpoint` between iterations cuts lineage so iteration k
 *    never replans k-1 nested joins (the k-means lineage lesson,
 *    Similarity.scala:325-332);
 *  - convergence is the (row count, exact decimal label sum) pair:
 *    rows are only added and labels only decrease, so an unchanged pair
 *    IS the fixpoint — one metadata-sized driver action per iteration
 *    (which also materializes the lazy checkpoint), no join against the
 *    previous labels.
 *
 * Cost profile: at test SF the loop is bound by FIXED per-round job
 * latency (~1s/round on local[32] for kilobyte-sized label tables, A/B
 * measured identical with eager vs lazy checkpoints) — the same
 * scale-invariant floor as the k-means Lloyd collects. The data-
 * proportional cost, which is what matters at 100 TB, is one
 * (id, label)-shuffle per round.
 */
object ConnectedComponents {

  /** Component labels plus the loop verdict: `labels` has one row per
    * VERTEX, (`id`, `label`) where `label` = min id reachable from `id`
    * (edges may pass through non-vertex ids, which conduct connectivity
    * and can be the min; they never appear as output rows); `converged`
    * is false iff `maxIters` rounds still changed a label (callers decide
    * whether partial transitivity is acceptable). */
  final case class Result(labels: DataFrame, iterations: Int, converged: Boolean)

  /** One min-label propagation round. Exposed for the suite's
    * shuffle-count assert. `edges` must be symmetrized (src, dst);
    * `labels` must be (id, label). */
  private[operators] def step(labels: DataFrame, edges: DataFrame): DataFrame = {
    val msgs = edges
      .join(labels.withColumnRenamed("id", "src"), "src")
      .select(col("dst").as("id"), col("label"))
    msgs.unionByName(labels)
      .groupBy("id").agg(min("label").as("label"))
  }

  /** Pointer jump: label := label(label). Every label is a vertex id (a
    * component member seen so far), so the lookup is a self-join that
    * always matches; the coalesce is belt-and-braces. Monotone: the
    * looked-up label is ≤ the label it replaces. */
  private[operators] def shortcut(labels: DataFrame): DataFrame = {
    val lookup = labels
      .select(col("id").as("__lk_id"), col("label").as("__lk_label"))
    labels.join(lookup, col("label") === col("__lk_id"), "left")
      .select(col("id"),
        coalesce(col("__lk_label"), col("label")).as("label"))
  }

  /** One ALTERNATING star round (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", the two-star algorithm): large-star hangs
    * every node's LARGER neighbors onto its neighborhood minimum,
    * small-star re-hangs the smaller ones, and the composition contracts
    * any graph toward per-component stars centered on the min id in
    * O(log) rounds — geometrically, because each round SHRINKS the edge
    * set it hands the next one (propagation's per-round work stays
    * edge-proportional for the whole run; contraction's decays). Input
    * and output are canonical big→small directed edges, no self-loops.
    * Exposed for the suite's shuffle/payload asserts. */
  private[operators] def starRound(canon: DataFrame): DataFrame = {
    // large-star over the SYMMETRIC neighborhood of the current edges:
    // m(u) = min(Γ(u) ∪ {u}); emit (v, m(u)) for v ∈ Γ(u), v > u.
    // Every output edge points big→small (v > u ≥ m(u)).
    val nbrs = canon.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(canon.select(col("dst").as("u"), col("src").as("v")))
    // m = min(Γ(u) ∪ {u}): the ∪{u} half folds in AFTER the aggregate —
    // u is the grouping key, so the shuffle carries (u, partial-min)
    // and nothing else (suite-pinned two-longs payload)
    val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    // Lazy checkpoint: `large` feeds BOTH the small-star aggregate and
    // the re-hang join below — without a materialization boundary the
    // whole large-star subtree (union + two shuffles) would execute
    // twice per round (the Dedup edge-union precedent).
    val large = nbrs.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
      .localCheckpoint(false)
    // small-star over the now-directed edges: per node u (src side), its
    // neighbors are all SMALLER; m(u) = min of them; re-hang every
    // neighbor (and u itself) on m(u).
    val mins2 = large.groupBy("src").agg(min("dst").as("m"))
    val rehung = large.join(mins2, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .unionByName(mins2.select(col("src"), col("m").as("dst")))
    rehung.filter(col("src") =!= col("dst")).distinct()
  }

  /** Default for `localEdgeThreshold` (deduped UNDIRECTED edges): 2M.
    * The local path collects the symmetrized list — 4M (long, long)
    * rows, a few hundred MB of transient boxed Rows during the collect
    * — sized for a production driver (multi-GB heaps); tune down for
    * thin drivers, 0 to disable. */
  val DefaultLocalEdgeThreshold: Long = 2L * 1000 * 1000

  /**
   * @param vertices relation containing `idCol` (unique long per vertex);
   *                 extra columns are ignored
   * @param edges    undirected pair list; duplicates and self-loops are
   *                 tolerated (deduped/ignored by construction)
   * @param maxIters hard bound on rounds (with the shortcut engaged,
   *                 convergence needs ~shortcutAfter + log2(diameter)
   *                 rounds, so the default covers any component a real
   *                 corpus can produce)
   * @param shortcutAfter rounds of plain (cheapest) propagation before
   *                 the pointer-jump joins in — shallow components, the
   *                 overwhelmingly common case, converge without ever
   *                 paying the extra label-table join
   * @param algorithm distributed resolution strategy past the local
   *                 gate: `"propagate"` (default) is the min-label loop
   *                 above — cheapest per round, right for the shallow
   *                 template families that dominate real corpora;
   *                 `"star"` is alternating large-star/small-star
   *                 contraction ([[starRound]]) — per-round cost DECAYS
   *                 as the graph contracts, the safe choice for
   *                 adversarial/deep pair graphs (long duplicate chains
   *                 from scraped near-identical page series), converging
   *                 in O(log) rounds on a path without ever carrying the
   *                 full edge set through all of them
   * @param localEdgeThreshold deduped-edge count at or below which the
   *                 component resolution runs as a DRIVER-SIDE union-find
   *                 over the collected (metadata-sized) edge list instead
   *                 of the iterative loop — the same decision AQE makes
   *                 when it broadcasts a small join side. Verified
   *                 near-dup graphs are SPARSE relative to the corpus
   *                 (hundreds of edges per 5k docs at test SF), so below
   *                 the threshold the distributed loop is all fixed
   *                 per-round job latency for zero data-parallelism win;
   *                 past it (billions of pairs at 100 TB) the iterative
   *                 path engages unchanged. 0 disables the local path
   *                 (how the suite pins the distributed plan).
   */
  def run(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 25,
      shortcutAfter: Int = 5,
      localEdgeThreshold: Long = DefaultLocalEdgeThreshold,
      algorithm: String = "propagate"): Result = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(algorithm == "propagate" || algorithm == "star",
      s"algorithm must be 'propagate' or 'star', got '$algorithm'")
    val pairs = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // Symmetrize + dedup once; partition by src so every iteration's join
    // reads this one cached exchange. distinct() also drops repeated pairs
    // coming from unioned candidate families (same pair found by several
    // sketches) so per-round message volume is minimal.
    val sym = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .cache()

    val vertexIds = vertices.select(col(idCol).as("id"))

    // The sizing action doubles as the cache materialization round 1
    // would otherwise pay — the distributed path does no extra work.
    // sym carries 2 rows per undirected edge, so the gate compares
    // against 2× the (undirected) threshold.
    val symCount = sym.count()
    if (localEdgeThreshold > 0 && symCount <= 2 * localEdgeThreshold) {
      val result = runLocal(vertexIds, sym)
      sym.unpersist(blocking = false)
      return result
    }
    if (algorithm == "star") {
      val result = runStar(vertexIds, sym, maxIters)
      sym.unpersist(blocking = false)
      return result
    }
    var labels = vertexIds
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    // Convergence = the (row count, exact decimal label sum) PAIR is
    // unchanged. Rows are only ever ADDED (the propagate union keeps every
    // existing row; edges through ids outside the vertex seed surface as
    // new rows) and existing labels only ever DECREASE, so an unchanged
    // pair means no row appeared and no label moved — exactly a fixpoint.
    // Sum alone is NOT sound here: a new row's label (+L) can cancel a
    // propagation decrease (−L) and fake convergence
    // (ConnectedComponentsSuite's non-vertex-edges test guards the class).
    // One metadata-sized driver action per round computes both.
    def labelStats(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)), sum(col("label").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    // Null-safe: an EMPTY relation has (0, null) stats — sum over zero rows
    // is NULL — and an empty label table is a fixpoint (step() of empty is
    // empty), so (0, null) == (0, null) must read as converged, not NPE.
    def sameStats(a: (Long, java.math.BigDecimal), b: (Long, java.math.BigDecimal)): Boolean =
      a._1 == b._1 && java.util.Objects.compare(
        a._2, b._2, java.util.Comparator.nullsFirst(java.util.Comparator.naturalOrder[java.math.BigDecimal]())) == 0

    var prev = labelStats(labels)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      // LAZY checkpoint: the convergence stats below are the round's one
      // action — it materializes the checkpointed blocks as it computes,
      // so each round costs a single job instead of an eager-checkpoint
      // job plus a stats job
      val propagated = step(labels, sym)
      labels = (if (iters >= shortcutAfter) shortcut(propagated) else propagated)
        .localCheckpoint(false)
      iters += 1
      val s = labelStats(labels)
      converged = sameStats(s, prev)
      prev = s
    }
    sym.unpersist(blocking = false)
    if (!converged) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connected components did not converge in $maxIters rounds; " +
          "labels are a refinement (over-segmented), not final components")
    }
    // cut the non-vertex endpoints (seeded only for convergence soundness)
    Result(labels.join(vertexIds, Seq("id"), "left_semi"), iters, converged)
  }

  /** The star-contraction loop: alternate [[starRound]] until the edge
    * set is stable. Convergence is the (row count, edge-hash sum) pair —
    * rounds both shrink and rewrite edges, so neither count nor a plain
    * value sum is monotone alone; the xxhash64 sum makes an unchanged
    * pair a collision-improbable fixpoint certificate, computed by the
    * same one driver action that materializes the round's checkpoint.
    * At the fixpoint every component is a star on its min id, so labels
    * fall out of the edge set directly: src rows label to their (unique)
    * dst, centers and isolated vertices label themselves. On a maxIters
    * bail-out the partial labels are still a refinement (every canonical
    * edge points big→small within one true component). */
  private def runStar(
      vertexIds: DataFrame, sym: DataFrame, maxIters: Int): Result = {
    def edgeStats(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    def same(a: (Long, java.math.BigDecimal), b: (Long, java.math.BigDecimal)): Boolean =
      a._1 == b._1 && java.util.Objects.compare(
        a._2, b._2, java.util.Comparator.nullsFirst(
          java.util.Comparator.naturalOrder[java.math.BigDecimal]())) == 0

    var canon = sym.filter(col("src") > col("dst")).localCheckpoint(false)
    var prev = edgeStats(canon)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      canon = starRound(canon).localCheckpoint(false)
      iters += 1
      val s = edgeStats(canon)
      converged = same(s, prev)
      prev = s
    }
    if (!converged) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"star contraction did not converge in $maxIters rounds; " +
          "labels are a refinement (over-segmented), not final components")
    }
    val labels = vertexIds
      .join(canon.groupBy("src").agg(min("dst").as("label"))
        .withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    Result(labels, iters, converged)
  }

  /** Metadata-sized graphs: exact min-id union-find on the driver over
    * the collected edge list, shipped back as one broadcast-joined label
    * table. Semantics identical to the loop — labels are the min id
    * reachable through any chain, non-vertex endpoints conduct
    * connectivity but never surface as rows, isolated vertices label
    * themselves. Always `converged` (union-find is exact), 0 iterations. */
  private def runLocal(vertexIds: DataFrame, sym: DataFrame): Result = {
    val spark = vertexIds.sparkSession
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    sym.select("src", "dst").collect().foreach { row =>
      val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
      // min root wins, so find() always returns the component's min id
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labelRows = parent.keys.toSeq.map(id => (id, find(id)))
    val labels =
      if (labelRows.isEmpty) vertexIds.select(col("id"), col("id").as("label"))
      else {
        val labelDf = spark.createDataFrame(labelRows).toDF("id", "label")
        vertexIds.join(broadcast(labelDf), Seq("id"), "left")
          .select(col("id"), coalesce(col("label"), col("id")).as("label"))
      }
    Result(labels, 0, converged = true)
  }
}
