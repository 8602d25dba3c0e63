package graft.operators

import graft.{SparkEntry, SparkSuite}

/**
 * Semantics of `mix_temperature` beyond the oracle's value pinning: the
 * α = 0.5 flattening must boost under-represented sources, shrink
 * dominant ones, preserve the size ordering, and produce a valid
 * distribution.
 */
class MixTemperatureSuite extends SparkSuite {

  test("temperature flattening boosts small sources, shrinks large, keeps order") {
    val rows = SparkEntry.queries("mix_temperature")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length > 1, "fixture needs multiple sources")

    // sqrt-flattening boosts exactly the shares below 1/S² where
    // S = Σ√pᵢ (√p/S > p ⟺ p < 1/S²) — NOT the mean 1/n: with skewed
    // shares the crossover sits strictly above 1/n, so a source slightly
    // over the mean is legitimately boosted
    val crossover = {
      val s = rows.map(r => math.sqrt(r._3)).sum
      1.0 / (s * s)
    }
    rows.foreach { case (src, _, actual, temp, boost) =>
      if (actual < crossover - 1e-3)
        assert(temp > actual && boost > 1.0, s"$src not boosted: $actual -> $temp")
      if (actual > crossover + 1e-3)
        assert(temp < actual && boost < 1.0, s"$src not shrunk: $actual -> $temp")
    }
    // flattening never reorders: sqrt is monotone
    val bySize = rows.sortBy(_._2)
    assert(bySize.map(_._4).toSeq == bySize.map(_._4).sorted.toSeq,
      "temp shares must preserve the size ordering")
    // both share columns are distributions (4-decimal rounding slack)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-2)
  }
}
