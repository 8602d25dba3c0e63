package graft.filter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

/**
 * A set of identified drop-predicates, mutable at runtime.
 *
 * Reference: dynamic/filter/FilterChain.java:37-137 — a ConcurrentHashMap of
 * FilterChainStep keyed by sideline-request id; a message is dropped if ANY
 * step matches; steps are added on sideline START and removed on RESOLVE
 * while the firehose keeps running.
 *
 * Spark-first: the chain is immutable-per-batch. The streaming firehose
 * re-reads the chain from the control store at every micro-batch boundary
 * (foreachBatch), so mutation is visible with at most one batch of latency —
 * the same visibility guarantee the reference achieves with its map, minus
 * the data race. `keep` compiles the whole chain to ONE Catalyst predicate
 * so Catalyst can push it into the scan.
 */
final case class FilterChain(steps: Map[String, FilterSpec]) {
  import FilterChain.balanced

  def withStep(id: String, step: FilterSpec): FilterChain =
    FilterChain(steps + (id -> step))

  def withoutStep(id: String): FilterChain = FilterChain(steps - id)

  def hasStep(id: String): Boolean = steps.contains(id)

  /** TRUE when any step drops the row (reference FilterChain.filter:72-85).
   * Each step's verdict is null-safed (NULL = "not dropped"): a NULL
   * verdict (e.g. KeyIn on a NULL key) would otherwise silently remove the
   * row from BOTH the firehose and the sideline replay under SQL
   * three-valued logic. Value form — never NULL, safe for annotation
   * columns and metrics groupBys. */
  def dropColumn: Column =
    if (steps.isEmpty) lit(false)
    else balanced(steps.toSeq.sortBy(_._1)
      .map(_._2.dropColumnNullSafe), _ || _)

  /** WHERE predicate for the firehose: rows that survive the chain. Same
   * truth table as !dropColumn, but built as a conjunction of per-step
   * (NOT p OR p IS NULL) terms so each conjunct stays translatable into
   * source pushdown (a coalesce() wrapper is not a translatable source
   * filter and would disable pushdown). */
  def keep: Column =
    if (steps.isEmpty) lit(true)
    else balanced(steps.toSeq.sortBy(_._1)
      .map(_._2.keepColumn), _ && _)

  /** WHERE predicate for a sideline replay of step `id`: ONLY the rows that
   * step dropped (reference NegatingFilterChainStep semantics). Null-safed
   * with the same NULL="not dropped" convention as [[keep]], in the
   * pushdown-friendly p AND (p IS NOT NULL) form. */
  def sidelined(id: String): Column = steps(id).sidelinedColumn

  private def ordered: Seq[(String, FilterSpec)] = steps.toSeq.sortBy(_._1)

  /** DataFrame-transform form of [[keep]] — THE application path for
   * chains that may carry join-backed steps ([[FilterSpec.KeyInTable]]).
   * Scalar steps compile to the identical single conjunction [[keep]]
   * builds (pushdown intact); join-backed steps then apply as broadcast
   * anti-joins. Engine call sites (firehose, sideline replay) all route
   * through here, so a runtime-added KeyInTable step just works. */
  def applyKeep(df: DataFrame): DataFrame = {
    val (joins, scalars) = ordered.partition(_._2.joinBacked)
    val filtered =
      if (scalars.isEmpty) df
      else df.filter(balanced(scalars.map(_._2.keepColumn), _ && _))
    joins.foldLeft(filtered)((d, kv) => kv._2.applyKeep(d))
  }

  /** DataFrame-transform form of [[sidelined]]: only the rows step `id`
   * drops — a filter for scalar steps, a broadcast semi-join for
   * join-backed ones. */
  def applySidelined(id: String, df: DataFrame): DataFrame =
    steps(id).applySidelined(df)

  /** Annotate `df` with a never-NULL boolean `as` column carrying the
   * whole chain's drop verdict — the firehose's routing/metrics column
   * (value form of [[dropColumn]]). Scalar-only chains produce exactly
   * the `withColumn(as, dropColumn)` plan of r1-r4; join-backed steps
   * contribute via per-step annotate joins OR-ed in. */
  def annotateDrop(df: DataFrame, as: String): DataFrame = {
    val (joins, scalars) = ordered.partition(_._2.joinBacked)
    val scalarVerdict =
      if (scalars.isEmpty) lit(false)
      else balanced(scalars.map(_._2.dropColumnNullSafe), _ || _)
    if (joins.isEmpty) df.withColumn(as, scalarVerdict)
    else {
      val tmp = joins.indices.map(i => s"__graft_drop_$i")
      val annotated = joins.zip(tmp).foldLeft(df) {
        case (d, ((_, s), t)) => s.annotateDrop(d, t)
      }
      annotated
        .withColumn(as, balanced(scalarVerdict +: tmp.map(col), _ || _))
        .drop(tmp: _*)
    }
  }
}

object FilterChain {
  val empty: FilterChain = FilterChain(Map.empty)

  /** Balanced pairwise reduction: a many-thousand-step chain must not
    * compile to a left-deep expression tree — Catalyst's converters and
    * optimizer recurse per node, and a linear-depth tree overflows the
    * stack in exactly the way a 1000-term inline bounds predicate did
    * (LogSourceBoundsSuite). Depth is log2(n) instead. */
  private def balanced(cols: Seq[Column], op: (Column, Column) => Column): Column =
    FilterSpec.balancedReduce(cols, op)
}
