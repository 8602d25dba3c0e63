package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row entering the top-k aggregation. */
final case class Scored(id: Long, score: Double)

/** Bounded partial top-k state — never more than k items. */
final case class TopKBuffer(items: Seq[Scored])

/**
 * Typed per-group top-k as a custom `Aggregator` (the SURVEY §2.14 UDAF
 * surface): keeps at most k (score DESC, id ASC) items per group in the
 * aggregation buffer, so the plan aggregates partially on the map side
 * and shuffles AT MOST k rows per (partition, group) — the scale-correct
 * alternative to `row_number().over(partitionBy(...))`, whose window
 * sorts every row of every group after a full shuffle.
 *
 * Determinism: ties break on ascending id, so results are stable and
 * oracle-checkable. The per-reduce sort is O(k log k) on a k+1-element
 * buffer — for large k swap in a bounded heap, the contract is the same.
 */
final class TopKAggregator(k: Int)
    extends Aggregator[Scored, TopKBuffer, Seq[Scored]] {
  require(k > 0, "k must be positive")

  private def trim(items: Seq[Scored]): Seq[Scored] =
    items.sortBy(r => (-r.score, r.id)).take(k)

  override def zero: TopKBuffer = TopKBuffer(Nil)
  override def reduce(b: TopKBuffer, a: Scored): TopKBuffer =
    TopKBuffer(trim(b.items :+ a))
  override def merge(x: TopKBuffer, y: TopKBuffer): TopKBuffer =
    TopKBuffer(trim(x.items ++ y.items))
  override def finish(b: TopKBuffer): Seq[Scored] = trim(b.items)
  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
