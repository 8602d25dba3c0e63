package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** UniMax allocation invariants (the published recurrence's defining
  * properties, checked independently of the oracle replay): cap
  * respected, budget conserved, and the un-capped tail shares the
  * rolled-forward remainder near-uniformly. */
class MixUnimaxSuite extends SparkSuite {

  test("unimax: cap respected, budget conserved, tail near-uniform") {
    val rows = SparkEntry.queries("mix_unimax")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val total = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val budget = total / 2

    // every source's allocation respects the 2-epoch cap
    rows.foreach { case (src, tok, alloc, _, _) =>
      assert(alloc <= 2 * tok, s"$src over cap") }
    // budget conserved up to the integer-division dust (< #sources)
    val spent = rows.map(_._3).sum
    assert(spent <= budget && budget - spent < rows.length)
    // capped sources absorb less than their fair share would have been;
    // un-capped (fair-share) allocations differ by at most 1 among the
    // LARGEST sources (the final fair share stabilizes once no cap binds)
    val uncapped = rows.filterNot(_._5).map(_._3)
    if (uncapped.length >= 2) {
      val tail = rows.sortBy(_._2).dropWhile(_._5).map(_._3)
      assert(tail.max - tail.min <= tail.length,
        s"tail spread ${tail.mkString(",")}")
    }
    // epochs_e4 consistency
    rows.foreach { case (_, tok, alloc, e4, _) =>
      assert(e4 === alloc * 10000 / tok) }
  }
}
