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
}
