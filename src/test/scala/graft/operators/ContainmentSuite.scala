package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}

/** Completeness pin for prefix-filtered containment dedup: the prefix
  * candidate generation must find EXACTLY the pairs an exhaustive
  * all-pairs sweep finds at the threshold (the prefix-filter theorem,
  * checked on real data rather than trusted). */
class ContainmentSuite extends SparkSuite {

  test("prefix filtering equals exhaustive all-pairs at containment >= 0.8") {
    // split(" ", -1): Java split drops TRAILING empty tokens where
    // Spark's keeps them — the -1 limit restores Spark's semantics
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      // match the query's size filter: sliding(3) on a SHORT array emits
      // one undersized pseudo-window instead of nothing
      .filter(_._2.length >= 3)
      .map { case (id, toks) =>
        id -> toks.sliding(3).map(_.mkString(" ")).toSet
      }
    val expected = (for {
      (i, a) <- docs; (j, b) <- docs if i < j
      inter = (a & b).size
      nSmall = math.min(a.size, b.size)
      if 5 * inter >= 4 * nSmall
    } yield (i, j, inter, nSmall,
        math.floor(inter.toDouble / nSmall * 1e4 + 0.5) / 1e4))
      .sortBy(p => (p._1, p._2))

    val got = SparkEntry.queries("dedup_containment")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
  }

  test("positional filter loses nothing in a hot-shingle corpus with injected supersets") {
    // r16: the candidate join carries a PPJoin positional filter so
    // corpus growth can't make candidates quadratic. Its failure mode
    // would be dropping a TRUE pair whose matching shingles sit late in
    // the frequency order — so this corpus is built to maximize that
    // pressure: a 5-word vocabulary (every shingle hot, postings dense)
    // with injected superset pairs (doc B = doc A + commentary, the
    // asymmetric duplicates the operator exists for).
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps")
    val base = (0 until 300).map { i =>
      (i.toLong, Seq.fill(30 + rnd.nextInt(30))(
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val supersets = (0 until 12).map { k =>
      val (srcId, srcText) = base(rnd.nextInt(base.length))
      (1000L + k,
        srcText + " " + Seq.fill(4)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val all = base ++ supersets
    val dir = java.nio.file.Files.createTempDirectory("contain-hot").toString
    all.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' as lang", "'src0' as source",
        "cast(length(text) as long) as n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val docs = all.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (i, a) <- docs; (j, b) <- docs if i < j
      inter = (a & b).size
      nSmall = math.min(a.size, b.size)
      if 5 * inter >= 4 * nSmall
    } yield (i, j)).sortBy(identity)
    assert(expected.size >= 12, s"fixture lost its injected pairs: $expected")

    val got = SparkEntry.queries("dedup_containment")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }
}
