package graft.operators

import graft.{SparkEntry, SparkSuite}

/** The z-order layout claim, made a number: per-cell min/max envelopes
  * must be NARROW on BOTH dimensions (that is what lets footer stats
  * prune on either predicate). With 6 cell bits the top 3 interleaved
  * bits of each dim define the cell, so a cell's span is ≈ 1/8 of each
  * dim's range — assert the mean span stays under 1/4 (2× slack for
  * normalization rounding and sparse cells). */
class LayoutSuite extends SparkSuite {

  test("z-order cells bound both dimensions, not just one") {
    val cells = SparkEntry.queries("layout_zorder")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(cells.nonEmpty)
    val gDay = (cells.map(_._2).min, cells.map(_._3).max)
    val gPk = (cells.map(_._4).min, cells.map(_._5).max)
    val dayRange = (gDay._2 - gDay._1).toDouble
    val pkRange = (gPk._2 - gPk._1).toDouble
    // weight by rows so empty/sparse edge cells don't dominate
    val n = cells.map(_._1).sum.toDouble
    val meanDaySpan = cells.map(c => c._1 * (c._3 - c._2).toDouble).sum / n
    val meanPkSpan = cells.map(c => c._1 * (c._5 - c._4).toDouble).sum / n
    assert(meanDaySpan / dayRange < 0.25,
      s"day span ${meanDaySpan / dayRange} not narrow")
    assert(meanPkSpan / pkRange < 0.25,
      s"pk span ${meanPkSpan / pkRange} not narrow")
    // every row accounted for
    assert(cells.map(_._1).sum ===
      graft.Tables.lineitem(spark, sfDir).count())
  }
}
