package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

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
  def withStep(id: String, step: FilterSpec): FilterChain =
    FilterChain(steps + (id -> step))

  def withoutStep(id: String): FilterChain = FilterChain(steps - id)

  def hasStep(id: String): Boolean = steps.contains(id)

  /** TRUE when any step drops the row (reference FilterChain.filter:72-85).
   * Each step's verdict is null-safed with coalesce(_, false): a NULL
   * verdict (e.g. KeyIn on a NULL key) means "not dropped", so every row
   * lands on exactly one side of the firehose ∪ sideline partition instead
   * of silently vanishing from both under SQL three-valued logic. */
  def dropColumn: Column =
    if (steps.isEmpty) lit(false)
    else steps.toSeq.sortBy(_._1)
      .map(_._2.dropColumnNullSafe)
      .reduceLeft(_ || _)

  /** WHERE predicate for the firehose: rows that survive the chain. */
  def keep: Column = !dropColumn

  /** WHERE predicate for a sideline replay of step `id`: ONLY the rows that
   * step dropped (reference NegatingFilterChainStep semantics). Null-safed
   * the same way as [[dropColumn]] so both sides use one definition. */
  def sidelined(id: String): Column = steps(id).dropColumnNullSafe
}

object FilterChain {
  val empty: FilterChain = FilterChain(Map.empty)
}
