package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The cross-round scaling regression gate (r17): the ×10 ratios exist
 * per round in METRICS_r*.json — this machinery compares them so the
 * next superlinear regression is caught by the artifact itself. Pins:
 * the pure comparison core fires on a synthetic >1.5× degradation and
 * only then, the artifact parser reads real METRICS shapes, and the
 * end-to-end gate flags (degraded + ok:false) against a baseline file.
 */
class ScaleGateSuite extends AnyFunSuite {

  private def metrics(wall: Double, shuffle: Double,
      contended: Boolean = false): String =
    s"""{"round": 16, "scaling": {
       |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": $contended},
       |"queries": {
       |  "knn_graph": {"x1": {"wall_sec": 1.0}, "wall_ratio_10x": $wall,
       |    "shuffle_ratio_10x": $shuffle, "output_ratio_10x": 10.0}
       |}}}""".stripMargin

  test("ratioDeltas: degraded iff a ratio grew past RegressionFactor") {
    val prior = Map("q" -> Map("wall_ratio_10x" -> 4.0, "shuffle_ratio_10x" -> 10.0))
    def current(w: Double, s: Double) =
      Map("q" -> Map("wall_ratio_10x" -> w, "shuffle_ratio_10x" -> s))
    // 1.5x exactly is NOT a regression; just past it is
    assert(!ScaleReport.ratioDeltas(prior, current(6.0, 15.0)).exists(_.degraded))
    assert(ScaleReport.ratioDeltas(prior, current(6.1, 15.0))
      .filter(_.degraded).map(_.metric) == Seq("wall_ratio_10x"))
    assert(ScaleReport.ratioDeltas(prior, current(4.0, 15.1))
      .filter(_.degraded).map(_.metric) == Seq("shuffle_ratio_10x"))
    // an IMPROVED ratio never flags
    assert(!ScaleReport.ratioDeltas(prior, current(1.0, 1.0)).exists(_.degraded))
    // a query the baseline never recorded never flags
    assert(!ScaleReport.ratioDeltas(Map.empty, current(99.0, 99.0))
      .exists(_.degraded))
  }

  test("scalingRatiosOf parses METRICS and standalone ScaleReport shapes") {
    val fromMetrics = ScaleReport.scalingRatiosOf(metrics(4.7, 9.8))
    assert(fromMetrics("knn_graph") ==
      Map("wall_ratio_10x" -> 4.7, "shuffle_ratio_10x" -> 9.8,
        "output_ratio_10x" -> 10.0))
    val standalone = ScaleReport.scalingRatiosOf(
      """{"queries": {"q": {"wall_ratio_10x": 2.0}}}""")
    assert(standalone("q") == Map("wall_ratio_10x" -> 2.0))
    assert(ScaleReport.scalingRatiosOf("""{"scaling": null}""").isEmpty)
  }

  test("end-to-end: the gate flags a synthetic regression against a baseline file") {
    val dir = java.nio.file.Files.createTempDirectory("gate")
    java.nio.file.Files.write(dir.resolve("METRICS_r16.json"),
      metrics(4.7, 9.8).getBytes("UTF-8"))
    // current round regressed wall 4.7 -> 9.0 (>1.5x)
    val flagged = ScaleReport.regressionGateJson(dir.toString, 17,
      metrics(9.0, 9.8))
    assert(flagged.contains(""""ok": false"""), flagged)
    assert(flagged.contains("knn_graph/wall_ratio_10x"), flagged)
    assert(flagged.contains(""""baseline": "METRICS_r16.json""""), flagged)
    // within budget: ok, no regressions listed
    val clean = ScaleReport.regressionGateJson(dir.toString, 17,
      metrics(5.0, 9.0))
    assert(clean.contains(""""ok": true""") &&
      clean.contains(""""regressions": []"""), clean)
    // no prior artifact: gate is a no-op, never an error
    val empty = java.nio.file.Files.createTempDirectory("gate2")
    val none = ScaleReport.regressionGateJson(empty.toString, 17,
      metrics(9.0, 9.8))
    assert(none.contains(""""baseline": null"""), none)
  }

  test("a ratio inflated by an x1 IMPROVEMENT is not a regression when the x10 absolute fell") {
    // the measured r17 case: the count memo took cosine's x1 wall
    // 9.4→1.9s, inflating the ratio 4.5→14.6 while the x10 wall FELL
    def m(ratio: Double, x10Wall: Double): String =
      s"""{"scaling": {"queries": {"q": {
         |  "x10": {"wall_sec": $x10Wall, "shuffle_write_bytes": 100},
         |  "wall_ratio_10x": $ratio, "shuffle_ratio_10x": 5.0}}}}""".stripMargin
    val prior = ScaleReport.scalingRatiosOf(m(4.5, 42.0))
    val improved = ScaleReport.scalingRatiosOf(m(14.6, 27.0))
    assert(!ScaleReport.ratioDeltas(prior, improved).exists(_.degraded))
    // but a ratio regression WITH a grown x10 absolute is real
    val worse = ScaleReport.scalingRatiosOf(m(14.6, 90.0))
    assert(ScaleReport.ratioDeltas(prior, worse)
      .filter(_.degraded).map(_.metric) == Seq("wall_ratio_10x"))
  }

  test("contended-host wall degradations demote to suspect; shuffle stays hard") {
    val dir = java.nio.file.Files.createTempDirectory("gate3")
    java.nio.file.Files.write(dir.resolve("METRICS_r16.json"),
      metrics(4.7, 9.8).getBytes("UTF-8"))
    // wall regressed but the sweep ran contended: suspect, ok stays true
    val wallOnly = ScaleReport.regressionGateJson(dir.toString, 17,
      metrics(9.0, 9.8, contended = true))
    assert(wallOnly.contains(""""ok": true"""), wallOnly)
    assert(wallOnly.contains(""""suspect": ["knn_graph/wall_ratio_10x"]"""),
      wallOnly)
    // a shuffle regression is deterministic — hard even when contended
    val shuffleToo = ScaleReport.regressionGateJson(dir.toString, 17,
      metrics(4.7, 20.0, contended = true))
    assert(shuffleToo.contains(""""ok": false"""), shuffleToo)
    assert(shuffleToo.contains("knn_graph/shuffle_ratio_10x"), shuffleToo)
  }

  test("a spill regression fires the gate even with wall and shuffle stable") {
    // the r17-verdict hole: dedup_clusters' x10 spill grew superlinearly
    // while wall/shuffle looked fine — the shuffle-only gate passed. The
    // spill metric is judged on the x10 ABSOLUTE (x1 spill is normally
    // zero, a ratio is undefined exactly where the signal lives).
    def m(memSpill: Long, diskSpill: Long): String =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": false},
         |"queries": {"q": {
         |  "x10": {"wall_sec": 35.0, "shuffle_write_bytes": 8496000000,
         |    "mem_spill_bytes": $memSpill, "disk_spill_bytes": $diskSpill,
         |    "peak_task_memory_bytes": 168000000},
         |  "wall_ratio_10x": 4.8, "shuffle_ratio_10x": 39.7,
         |  "peak_mem_ratio_10x": 4.9}}}}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("gate5")
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(0L, 0L).getBytes("UTF-8"))
    // spill materialized from a spill-free prior: hard
    val grew = ScaleReport.regressionGateJson(dir.toString, 18,
      m(9660000000L, 740000000L))
    assert(grew.contains(""""ok": false"""), grew)
    assert(grew.contains(""""q/x10_spill_bytes""""), grew)
    // sub-floor jitter from zero never flags
    val jitter = ScaleReport.regressionGateJson(dir.toString, 18,
      m(100000000L, 0L))
    assert(jitter.contains(""""ok": true"""), jitter)
    // growth within the factor never flags
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(9000000000L, 700000000L).getBytes("UTF-8"))
    val flat = ScaleReport.regressionGateJson(dir.toString, 18,
      m(9660000000L, 740000000L))
    assert(flat.contains(""""ok": true"""), flat)
    // past the factor: hard again
    val worse = ScaleReport.regressionGateJson(dir.toString, 18,
      m(20000000000L, 740000000L))
    assert(worse.contains(""""ok": false"""), worse)
  }

  test("a peak-task-memory ratio regression fires the gate") {
    def m(peakRatio: Double, x10Peak: Long): String =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": false},
         |"queries": {"q": {
         |  "x10": {"wall_sec": 35.0, "shuffle_write_bytes": 100,
         |    "mem_spill_bytes": 0, "disk_spill_bytes": 0,
         |    "peak_task_memory_bytes": $x10Peak},
         |  "wall_ratio_10x": 4.8, "shuffle_ratio_10x": 9.7,
         |  "peak_mem_ratio_10x": $peakRatio}}}}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("gate6")
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(1.1, 20000000L).getBytes("UTF-8"))
    // r19: peak task memory is SCHEDULING-dependent (measured 305 MB
    // in-sweep vs 69.8 MB solo on identical code+data), so a peak flag
    // whose byte signals are stable demotes to suspect — visible, solo-
    // adjudicable, escalating on quiet recurrence — instead of hard
    val grew = ScaleReport.regressionGateJson(dir.toString, 18,
      m(4.9, 100000000L))
    assert(grew.contains(""""ok": true"""), grew)
    assert(grew.contains(""""suspect": ["q/peak_mem_ratio_10x"]"""), grew)
    // ... and ESCALATES when it was already suspect last round (quiet)
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(1.1, 20000000L).replace("""}}}}""",
        """}}}, "scaling_regression_gate": {"suspect": ["q/peak_mem_ratio_10x"]}}""")
        .getBytes("UTF-8"))
    val second = ScaleReport.regressionGateJson(dir.toString, 18,
      m(4.9, 100000000L))
    assert(second.contains(""""ok": false"""), second)
    assert(second.contains(""""escalated": ["q/peak_mem_ratio_10x"]"""), second)
    // a peak flag CORROBORATED by grown shuffle bytes stays hard
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(1.1, 20000000L).getBytes("UTF-8"))
    val withShuffle = ScaleReport.regressionGateJson(dir.toString, 18,
      m(4.9, 100000000L).replace(""""shuffle_write_bytes": 100""",
        """"shuffle_write_bytes": 1000"""))
    assert(withShuffle.contains(""""ok": false"""), withShuffle)
    assert(withShuffle.contains(""""regressions": ["q/peak_mem_ratio_10x"]"""),
      withShuffle)
    // ratio inflated by a SHRUNK x1 denominator while the x10 absolute
    // held: not a regression (same guard as the wall metric)
    val denom = ScaleReport.regressionGateJson(dir.toString, 18,
      m(4.9, 20000000L))
    assert(denom.contains(""""ok": true"""), denom)
    assert(!denom.contains(""""suspect": ["q/peak_mem_ratio_10x"]"""), denom)
  }

  test("a prior-round suspect that reproduces on a quiet host escalates to hard") {
    // the r17-advice hole: wallNoiseDemoted demoted a REPRODUCIBLE
    // pure-compute regression to suspect every round forever. The
    // second quiet-host occurrence is the corroborating rerun.
    def m(ratio: Double, x10Wall: Double, suspects: String): String =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": false},
         |"queries": {"q": {
         |  "x10": {"wall_sec": $x10Wall, "shuffle_write_bytes": 8496000000,
         |    "mem_spill_bytes": 0, "disk_spill_bytes": 0,
         |    "peak_task_memory_bytes": 168000000},
         |  "wall_ratio_10x": $ratio, "shuffle_ratio_10x": 39.7}}},
         |"scaling_regression_gate": {"suspect": [$suspects]}}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("gate7")
    // round 17 gate already demoted q's wall flag to suspect
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(3.5, 35.0, "\"q/wall_ratio_10x\"").getBytes("UTF-8"))
    val again = ScaleReport.regressionGateJson(dir.toString, 18,
      m(6.3, 46.0, ""))
    assert(again.contains(""""ok": false"""), again)
    assert(again.contains(""""escalated": ["q/wall_ratio_10x"]"""), again)
    // without the prior suspect the same flag still demotes
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(3.5, 35.0, "").getBytes("UTF-8"))
    val first = ScaleReport.regressionGateJson(dir.toString, 18,
      m(6.3, 46.0, ""))
    assert(first.contains(""""ok": true"""), first)
    assert(first.contains(""""suspect": ["q/wall_ratio_10x"]"""), first)
    // on a CONTENDED host nothing corroborates — the suspect carries
    def contendedM(ratio: Double, x10Wall: Double): String =
      m(ratio, x10Wall, "").replace("\"contended\": false",
        "\"contended\": true")
    java.nio.file.Files.write(dir.resolve("METRICS_r17.json"),
      m(3.5, 35.0, "\"q/wall_ratio_10x\"").getBytes("UTF-8"))
    val contended = ScaleReport.regressionGateJson(dir.toString, 18,
      contendedM(6.3, 46.0))
    assert(contended.contains(""""ok": true"""), contended)
    assert(contended.contains(""""suspect": ["q/wall_ratio_10x"]"""), contended)
  }

  test("wall-only flag with stable resource signals demotes to suspect") {
    // the measured r17 case: two back-to-back UNCONTENDED sweeps held
    // dedup_clusters' shuffle/spill/peak-mem bit-identical while the
    // x10 wall swung 35->46s (ratio 3.5->6.3) — host/GC noise, not a
    // scaling regression; the gate must corroborate before failing
    def m(ratio: Double, x10Wall: Double, shuf: Long, spill: Long,
        peak: Long): String =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": false},
         |"queries": {"q": {
         |  "x10": {"wall_sec": $x10Wall, "shuffle_write_bytes": $shuf,
         |    "disk_spill_bytes": $spill, "peak_task_memory_bytes": $peak},
         |  "wall_ratio_10x": $ratio, "shuffle_ratio_10x": 39.7}}}}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("gate4")
    java.nio.file.Files.write(dir.resolve("METRICS_r16.json"),
      m(3.5, 35.0, 8496000000L, 740000000L, 168000000L).getBytes("UTF-8"))
    val demoted = ScaleReport.regressionGateJson(dir.toString, 17,
      m(6.3, 46.0, 8496000000L, 740000000L, 168000000L))
    assert(demoted.contains(""""ok": true"""), demoted)
    assert(demoted.contains(""""suspect": ["q/wall_ratio_10x"]"""), demoted)
    // the same wall swing with GROWN shuffle bytes is corroborated: hard
    val hard = ScaleReport.regressionGateJson(dir.toString, 17,
      m(6.3, 46.0, 17000000000L, 740000000L, 168000000L))
    assert(hard.contains(""""ok": false"""), hard)
    // ... or with spill materializing from a spill-free prior
    java.nio.file.Files.write(dir.resolve("METRICS_r16.json"),
      m(3.5, 35.0, 8496000000L, 0L, 168000000L).getBytes("UTF-8"))
    val spillGrew = ScaleReport.regressionGateJson(dir.toString, 17,
      m(6.3, 46.0, 8496000000L, 740000000L, 168000000L))
    assert(spillGrew.contains(""""ok": false"""), spillGrew)
  }

  test("a prior suspect that PLATEAUS is carried, escalated quiet, recovered loud") {
    // r18-advice medium: the baseline is the newest prior artifact —
    // which already recorded the regressed ratio. A plateau (3.5 ->
    // 3.5) is never `degraded` vs that ratcheted baseline, so without
    // carry-forward the suspect silently vanished from the gate.
    def m(ratio: Double, x10Wall: Double, suspects: String,
        contended: Boolean = false): String =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": $contended},
         |"queries": {"q": {
         |  "x10": {"wall_sec": $x10Wall, "shuffle_write_bytes": 8496000000,
         |    "mem_spill_bytes": 0, "disk_spill_bytes": 0,
         |    "peak_task_memory_bytes": 168000000},
         |  "wall_ratio_10x": $ratio, "shuffle_ratio_10x": 39.7}}},
         |"scaling_regression_gate": {"suspect": [$suspects]}}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("gate8")
    java.nio.file.Files.write(dir.resolve("METRICS_r18.json"),
      m(3.5, 46.0, "\"q/wall_ratio_10x\"").getBytes("UTF-8"))
    // quiet host, ratio plateaued (3.5 -> 3.5, not degraded vs the
    // ratcheted baseline): the suspect escalates — second quiet strike
    val plateau = ScaleReport.regressionGateJson(dir.toString, 19,
      m(3.5, 46.0, ""))
    assert(plateau.contains(""""ok": false"""), plateau)
    assert(plateau.contains(""""escalated": ["q/wall_ratio_10x"]"""), plateau)
    // quiet host, ratio within the 1.2x noise band of the suspect-round
    // value (3.5 -> 3.0 >= 3.5/1.2): still not recovered — escalates
    val noisy = ScaleReport.regressionGateJson(dir.toString, 19,
      m(3.0, 40.0, ""))
    assert(noisy.contains(""""ok": false"""), noisy)
    // contended host: nothing corroborates — the suspect carries forward
    val carried = ScaleReport.regressionGateJson(dir.toString, 19,
      m(3.5, 46.0, "", contended = true))
    assert(carried.contains(""""ok": true"""), carried)
    assert(carried.contains(""""suspect": ["q/wall_ratio_10x"]"""), carried)
    // genuine recovery (3.5 -> 1.4 < 3.5/1.2): recorded, gate clean
    val recovered = ScaleReport.regressionGateJson(dir.toString, 19,
      m(1.4, 18.0, ""))
    assert(recovered.contains(""""ok": true"""), recovered)
    assert(recovered.contains(""""suspect": []"""), recovered)
    assert(recovered.contains(""""recovered": ["q/wall_ratio_10x"]"""), recovered)
    // a suspect whose metric VANISHED from the sweep stays visible
    val gone = ScaleReport.regressionGateJson(dir.toString, 19,
      m(3.5, 46.0, "").replace("\"q\":", "\"other\":"))
    assert(gone.contains(""""suspect": ["q/wall_ratio_10x"]"""), gone)
    assert(gone.contains(""""ok": true"""), gone)
  }

  test("a carried suspect with NO recorded prior ratio re-baselines as suspect, never escalates") {
    // r19-advice low: a suspect whose prior ratio is missing from the
    // baseline artifact (prior = -1 — e.g. carried through a round whose
    // sweep dropped the metric) can never satisfy the recovery test
    // (requires prior > 0), so on a quiet host it escalated to a hard
    // regression regardless of how healthy the current ratio is. No
    // prior means nothing was corroborated: it must re-baseline as a
    // FRESH suspect instead.
    val priorArtifact =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": false},
         |"queries": {"q": {
         |  "x10": {"wall_sec": 46.0, "shuffle_write_bytes": 8496000000},
         |  "wall_ratio_10x": 2.0, "shuffle_ratio_10x": 9.7}}},
         |"scaling_regression_gate": {"suspect": ["q/peak_mem_ratio_10x"]}}""".stripMargin
    val current =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": false},
         |"queries": {"q": {
         |  "x10": {"wall_sec": 46.0, "shuffle_write_bytes": 8496000000,
         |    "peak_task_memory_bytes": 70000000},
         |  "wall_ratio_10x": 2.0, "shuffle_ratio_10x": 9.7,
         |  "peak_mem_ratio_10x": 1.4}}},
         |"scaling_regression_gate": {"suspect": []}}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("gate9")
    java.nio.file.Files.write(dir.resolve("METRICS_r19.json"),
      priorArtifact.getBytes("UTF-8"))
    val out = ScaleReport.regressionGateJson(dir.toString, 20, current)
    assert(out.contains(""""ok": true"""), out)
    assert(out.contains(""""escalated": []"""), out)
    assert(out.contains(""""suspect": ["q/peak_mem_ratio_10x"]"""), out)
  }

  test("adjudicated peak-mem pin: ratio growth under the absolute ceiling resolves pinned") {
    // r20, closing the r19 gate suspect: dedup_clusters' x10 peak-mem
    // ratio grows by design (face-independent elastic shuffle sort
    // buffers — docs/PLANS_r20.md §1), so the gate watches the ABSOLUTE
    // against the adjudicated ceiling instead of the ratio.
    def m(ratio: Double, absBytes: String, suspects: String): String =
      s"""{"scaling": {
         |"load": {"loadavg_start": 0.1, "other_jvms": 0, "contended": false},
         |"queries": {"dedup_clusters": {
         |  "x10": {"wall_sec": 16.0, "shuffle_write_bytes": 500000000,
         |    "mem_spill_bytes": 0, "disk_spill_bytes": 0$absBytes},
         |  "wall_ratio_10x": 2.0, "shuffle_ratio_10x": 11.9,
         |  "peak_mem_ratio_10x": $ratio}}},
         |"scaling_regression_gate": {"suspect": [$suspects]}}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("gate10")
    java.nio.file.Files.write(dir.resolve("METRICS_r19.json"),
      m(1.4, ", \"peak_task_memory_bytes\": 36000000",
        "\"dedup_clusters/peak_mem_ratio_10x\"").getBytes("UTF-8"))
    // the EXACT r20 situation: carried suspect, ratio plateaued at 8.55
    // on a quiet host, absolute 305 MB < the 640 MB ceiling -> pinned
    val plateau = ScaleReport.regressionGateJson(dir.toString, 20,
      m(8.55, ", \"peak_task_memory_bytes\": 304700000", ""))
    assert(plateau.contains(""""ok": true"""), plateau)
    assert(plateau.contains(""""pinned": ["dedup_clusters/peak_mem_ratio_10x"]"""), plateau)
    assert(plateau.contains(""""escalated": []"""), plateau)
    assert(plateau.contains(""""suspect": []"""), plateau)
    // a fresh degradation under the ceiling also resolves pinned
    java.nio.file.Files.write(dir.resolve("METRICS_r19.json"),
      m(1.4, ", \"peak_task_memory_bytes\": 36000000", "").getBytes("UTF-8"))
    val fresh = ScaleReport.regressionGateJson(dir.toString, 20,
      m(8.55, ", \"peak_task_memory_bytes\": 304700000", ""))
    assert(fresh.contains(""""ok": true""") &&
      fresh.contains(""""pinned": ["dedup_clusters/peak_mem_ratio_10x"]"""), fresh)
    // past the ceiling the pin does NOT apply — the flag re-enters the
    // normal peak-mem discipline (suspect on first occurrence since
    // byte signals are stable, escalating on a quiet recurrence), so
    // the ceiling is a watched number, not a blind spot
    val over = ScaleReport.regressionGateJson(dir.toString, 20,
      m(20.0, ", \"peak_task_memory_bytes\": 900000000", ""))
    assert(over.contains(""""pinned": []"""), over)
    assert(over.contains(""""suspect": ["dedup_clusters/peak_mem_ratio_10x"]"""), over)
    // ...and that suspect escalates on the next quiet round (unlike a
    // pinned-resolved one)
    java.nio.file.Files.write(dir.resolve("METRICS_r20.json"),
      m(20.0, ", \"peak_task_memory_bytes\": 900000000",
        "\"dedup_clusters/peak_mem_ratio_10x\"").getBytes("UTF-8"))
    val overNext = ScaleReport.regressionGateJson(dir.toString, 21,
      m(20.0, ", \"peak_task_memory_bytes\": 900000000", ""))
    assert(overNext.contains(""""ok": false"""), overNext)
    // a missing absolute cannot verify the ceiling -> never pinned
    val noAbs = ScaleReport.regressionGateJson(dir.toString, 20,
      m(8.55, "", ""))
    assert(noAbs.contains(""""pinned": []"""), noAbs)
  }

  test("spill gate metric sums whichever counters are present (missing = 0)") {
    // r18-advice low: requiring BOTH counters silently dropped the
    // spill gate metric for artifacts recording only one of them
    val onlyDisk =
      """{"queries": {"q": {"x10": {"disk_spill_bytes": 7.0e8},
        |  "wall_ratio_10x": 3.0}}}""".stripMargin
    val ratios = ScaleReport.scalingRatiosOf(onlyDisk)
    assert(ratios("q")("x10_spill_total_bytes") == 7.0e8, ratios)
    val onlyMem =
      """{"queries": {"q": {"x10": {"mem_spill_bytes": 5.0e8},
        |  "wall_ratio_10x": 3.0}}}""".stripMargin
    assert(ScaleReport.scalingRatiosOf(onlyMem)("q")("x10_spill_total_bytes") == 5.0e8)
    val neither =
      """{"queries": {"q": {"x10": {"wall_sec": 1.0},
        |  "wall_ratio_10x": 3.0}}}""".stripMargin
    assert(!ScaleReport.scalingRatiosOf(neither)("q").contains("x10_spill_total_bytes"))
  }
}
