package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The adaptive simhash key-space ladder (r20): B blocks, keys = every
  * (B−3)-subset of blocks. The contracts pinned here:
  *  - PIGEONHOLE COMPLETENESS at every rung: any signature pair within
  *    hamming 3 shares at least one band key (100% recall, no LSH
  *    probability trade) — checked against an INDEPENDENT bit-twiddling
  *    reimplementation in this suite over seeded random flips;
  *  - rung-4 band ids are BIT-IDENTICAL to the classic
  *    t·65536 + ((simhash >> 16t) & 65535) scheme (every driver corpus
  *    resolves to rung 4, so oracles and bench plans are unchanged);
  *  - the rung thresholds are the documented occupancy integers;
  *  - the generated SQL band expressions evaluate to the same values
  *    as the Column forms (both texts are parseable Spark arithmetic —
  *    the twin-lockstep check without leaving the JVM). */
class SimhashLadderSuite extends SparkSuite {

  /** Independent band computation: extract block values with plain
    * Scala bit math and concatenate the subset — deliberately NOT
    * sharing code with Dedup's Column/SQL generators. */
  private def referenceBands(sig: Long, b: Int): Seq[Long] = {
    val base = 64 / b
    val rem = 64 % b
    val lens = (0 until b).map(i => if (i < rem) base + 1 else base)
    val offs = lens.scanLeft(0)(_ + _)
    def block(j: Int): Long = (sig >>> offs(j)) & ((1L << lens(j)) - 1)
    val tables = (0 until b).combinations(b - 3).map(_.toSeq).toSeq
    val maxKeyBits = tables.map(_.map(lens).sum).max
    tables.zipWithIndex.map { case (combo, t) =>
      (t.toLong << maxKeyBits) |
        combo.foldLeft(0L)((acc, j) => (acc << lens(j)) | block(j))
    }
  }

  test("rung thresholds are the documented occupancy integers") {
    assert(Dedup.simhashBlocksFor(1L) == 4)
    assert(Dedup.simhashBlocksFor(32L << 16) == 4)       // 2,097,152
    assert(Dedup.simhashBlocksFor((32L << 16) + 1) == 5)
    assert(Dedup.simhashBlocksFor(32L << 25) == 5)       // ~1.07B
    assert(Dedup.simhashBlocksFor((32L << 25) + 1) == 6)
    // rung-6 ceiling: occupancy target at the narrowest 31-bit key
    assert((32L << Dedup.simhashTables(6).map(
      _.map(Dedup.simhashBlockLens(6)).sum).min) == (32L << 31))
  }

  test("pigeonhole completeness at every rung: hamming<=3 pairs always share a band") {
    val rnd = new scala.util.Random(20026)
    for (b <- Seq(4, 5, 6); _ <- 1 to 400) {
      val sig = rnd.nextLong()
      val flips = rnd.nextInt(4) // 0..3 bit flips
      val flipped = (1 to flips).foldLeft(sig)((s, _) => s ^ (1L << rnd.nextInt(64)))
      val shared = referenceBands(sig, b).toSet
        .intersect(referenceBands(flipped, b).toSet)
      assert(shared.nonEmpty,
        f"rung $b lost pair hamming=${java.lang.Long.bitCount(sig ^ flipped)} sig=$sig%x")
    }
    // ...and hamming 4 CAN escape (the guarantee is exactly <=3): flip
    // one bit in each of 4 distinct rung-4 blocks
    val sig = 0L
    val esc = (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)
    assert(referenceBands(sig, 4).toSet
      .intersect(referenceBands(sig ^ esc, 4).toSet).isEmpty)
  }

  test("rung 4 is bit-identical to the classic 4x16 scheme") {
    val rnd = new scala.util.Random(20027)
    for (_ <- 1 to 200) {
      val sig = rnd.nextLong()
      val classic = (0 until 4).map(t => t * 65536L + ((sig >>> (16 * t)) & 65535L))
      assert(referenceBands(sig, 4) == classic)
    }
  }

  test("Column and generated-SQL band forms agree with the reference at every rung") {
    import spark.implicits._
    val rnd = new scala.util.Random(20028)
    val sigs = Seq.fill(64)(rnd.nextLong()) :+ -1L :+ 0L :+ Long.MinValue
    val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "simhash")
    for (b <- Seq(4, 5, 6)) {
      val cols = Dedup.simhashBandCols(b)
      val sqls = Dedup.simhashBandSqls(b).map(expr)
      val rows = df.select(col("simhash"),
        array(cols: _*).as("viaCols"), array(sqls: _*).as("viaSql")).collect()
      rows.foreach { r =>
        val sig = r.getLong(0)
        val viaCols = r.getSeq[Long](1)
        val viaSql = r.getSeq[Long](2)
        assert(viaCols == referenceBands(sig, b), f"cols rung $b sig=$sig%x")
        assert(viaSql == referenceBands(sig, b), f"sql rung $b sig=$sig%x")
      }
    }
  }

  test("forced rung 5/6 EXECUTION equals brute-force hamming truth — 100% recall at every rung") {
    import spark.implicits._
    // pigeonhole recall is 100% and verification is exact, so the
    // verified pairs must EQUAL the all-pairs hamming<=3 truth at EVERY
    // rung; `precount` forces the rung on a small corpus (the decision
    // reads sizing metadata, like the fetch face)
    val rnd = new scala.util.Random(20030)
    val words = (0 until 50).map(i => s"w$i")
    val docs = (0 until 40).flatMap { g =>
      val toks = Seq.fill(30)(words(rnd.nextInt(words.length)))
      Seq(
        (g * 3L, toks.mkString(" ")),
        (g * 3L + 1, toks.mkString(" ")), // exact dup -> hamming 0
        (g * 3L + 2, (toks.dropRight(1) :+
          words(rnd.nextInt(words.length))).mkString(" ")))
    }.toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      graft.functions.VectorFunctions.simhash64(
        split(col("text"), " ")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = sig.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(sig(ids(i)) ^ sig(ids(j))); if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    assert(truth.nonEmpty, "fixture produced no near-dup pairs — vacuous")
    for (forcedN <- Seq(1L, (32L << 16) + 1, (32L << 25) + 1)) { // rungs 4, 5, 6
      val got = Dedup.simhashPairs(docs, precount = Some(forcedN))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.get(2).toString.toInt)).toSet
      assert(got == truth,
        s"rung for n=$forcedN: missing ${(truth -- got).take(3)}, " +
          s"extra ${(got -- truth).take(3)}")
    }
  }

  test("the SQL rung ladder carries the same thresholds as the Scala ladder") {
    val cte = Dedup.simhashBandsSqlCte
    assert(cte.contains(s"WHEN cnt <= ${32L << 16} THEN 4"), cte)
    assert(cte.contains(s"WHEN cnt <= ${32L << 25} THEN 5"), cte)
    assert(cte.contains("ELSE 6"), cte)
  }
}
