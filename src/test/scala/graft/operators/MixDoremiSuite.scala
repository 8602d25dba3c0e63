package graft.operators

import graft.{SparkEntry, SparkSuite}

/**
 * Semantics of `mix_doremi` beyond the oracle's value pinning: the
 * linearized-exponential reweight must upweight exactly the domains
 * with positive excess loss, order boosts by excess, and keep both
 * share columns valid distributions.
 */
class MixDoremiSuite extends SparkSuite {

  test("doremi reweight boosts hard domains, orders by excess, sums to 1") {
    val rows = SparkEntry.queries("mix_doremi")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length > 1, "fixture needs multiple sources")
    assert(rows.exists(_._3 > 0), "fixture needs at least one hard domain")

    // boost ∝ 1 + η·excess before normalization, so: zero-excess domains
    // dilute below their baseline share, and boosts order by excess
    rows.foreach { case (src, _, excess, actual, doremi, boost) =>
      if (excess == 0L)
        assert(boost < 1.0 + 1e-9 && doremi <= actual + 1e-9,
          s"$src has zero excess but boosted: $actual -> $doremi")
    }
    val byExcess = rows.sortBy(_._3)
    assert(byExcess.map(_._6).toSeq == byExcess.map(_._6).sorted.toSeq,
      "boost must be monotone in excess loss")
    assert(rows.maxBy(_._3)._6 == rows.map(_._6).max,
      "hardest domain gets the largest boost")
    // both share columns are distributions (4-decimal rounding slack)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-2)
  }
}
