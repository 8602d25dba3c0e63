package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * The adaptive SRP band ladder (r19, lifting the r18 weak flag): band
 * capacity must grow with the corpus so bucket occupancy — and with it
 * unrelated-candidate mass per bucket — stays ~constant, while the band
 * count grows by the LSH identity so ANALYTIC recall at the 0.45
 * threshold never drops below the 40×6 floor design's. Pins: the
 * integer rung thresholds, the recall-preservation property across every
 * rung, the floor at all three driver SFs, and the generated-SQL
 * lockstep (the DuckDB twin's CASE arms are interpolated from the same
 * Scala ladder — these pins fail if either side is hand-edited alone).
 */
class BandLadderSuite extends AnyFunSuite {

  test("rung thresholds: floor through 2048, one rung per doubling, capped") {
    // all three driver SFs (500/500/2000 embeddings) resolve to the
    // 40×6 floor — the oracle gate and RecallSuite pins are unchanged
    assert(Similarity.adaptiveBandParams(500L) == (6, 40))
    assert(Similarity.adaptiveBandParams(2000L) == (6, 40))
    assert(Similarity.adaptiveBandParams(2048L) == (6, 40))
    // first rung past the floor
    assert(Similarity.adaptiveBandParams(2049L) == (7, 63))
    assert(Similarity.adaptiveBandParams(4096L) == (7, 63))
    // the scaling sweep's corpora: ×10 = 20k, ×30 = 60k vectors
    assert(Similarity.adaptiveBandParams(20000L) == (10, 234))
    assert(Similarity.adaptiveBandParams(60000L) == (11, 361))
    // ladder cap: occupancy grows again past BandCellTarget * 2^max
    val cap = Similarity.BandCellTarget << Similarity.MaxRowsPerBand
    assert(Similarity.adaptiveBandParams(cap) ==
      (Similarity.MaxRowsPerBand, Similarity.bandsFor(Similarity.MaxRowsPerBand)))
    assert(Similarity.adaptiveBandParams(100L * cap)._1 ==
      Similarity.MaxRowsPerBand)
  }

  test("every rung holds the floor's analytic threshold recall") {
    val p = 1.0 - StrictMath.acos(0.45) / StrictMath.PI
    def recall(r: Int, b: Int): Double =
      1.0 - StrictMath.pow(1.0 - StrictMath.pow(p, r.toDouble), b.toDouble)
    val floor = recall(6, 40)
    assert(floor > 0.954 && floor < 0.956, s"floor drifted: $floor")
    (6 to Similarity.MaxRowsPerBand).foreach { r =>
      val b = Similarity.bandsFor(r)
      assert(recall(r, b) >= floor - 1e-9,
        f"rung $r×$b: recall ${recall(r, b)}%.4f below floor $floor%.4f")
      // and b is MINIMAL for that recall — one band fewer drops below
      if (r > 6) assert(recall(r, b - 1) < floor,
        s"rung $r: $b bands is not minimal")
    }
  }

  test("occupancy target: bucket count doubles before occupancy doubles") {
    // expected rows per band bucket n / 2^r stays within (target/2, target]
    // on every rung below the cap
    Seq(3000L, 10000L, 20000L, 60000L, 500000L, 2000000L).foreach { n =>
      val (r, _) = Similarity.adaptiveBandParams(n)
      if (r < Similarity.MaxRowsPerBand) {
        val occ = n.toDouble / (1L << r)
        assert(occ <= Similarity.BandCellTarget,
          s"n=$n r=$r occupancy $occ above target")
        assert(occ > Similarity.BandCellTarget / 2.0,
          s"n=$n r=$r occupancy $occ — rung overshot (wasted planes)")
      }
    }
  }

  test("the DuckDB twin's CASE ladder is generated from the same constants") {
    val sql = Similarity.embeddingCosinePairsSql
    // rung arms: integer thresholds, integer band counts — no SQL float
    (6 until Similarity.MaxRowsPerBand).foreach { r =>
      assert(sql.contains(s"WHEN cnt <= ${Similarity.BandCellTarget << r} THEN $r"),
        s"missing r-arm for rung $r")
      assert(sql.contains(s"WHEN $r THEN ${Similarity.bandsFor(r)}"),
        s"missing b-arm for rung $r")
    }
    // the plane relation enumerates the ladder maximum and filters to
    // the live plane count from the bp CTE
    val maxPlanes =
      Similarity.MaxRowsPerBand * Similarity.bandsFor(Similarity.MaxRowsPerBand)
    assert(sql.contains(s"range($maxPlanes)"))
    assert(sql.contains("pp.range < (SELECT r * b FROM bp)"))
  }
}
