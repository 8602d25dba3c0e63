package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Independent pins for the search/boilerplate operators: a pure-Scala
  * reimplementation of the SAME integer arithmetic on the driver,
  * compared row-for-row against the Spark plans — an engine-independent
  * check that doesn't share the plan's code path (the DuckDB oracle is
  * the third voice). */
class SearchSuite extends SparkSuite {

  private val Scale = 1048576L

  private def mlog2(x: Long): Long = {
    val l = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << l
    l * Scale + (x - p) * Scale / p
  }

  private def docTokens(): Map[Long, Array[String]] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap

  test("bm25 equals a pure-Scala reimplementation of the fixed-point formula") {
    val docs = docTokens()
    val terms = Search.QueryTerms.toSet
    val n = docs.size.toLong
    val t = docs.values.map(_.length.toLong).sum
    val tf = docs.toSeq.flatMap { case (id, toks) =>
      toks.filter(terms).groupBy(identity).map { case (w, o) =>
        (id, w, o.length.toLong, toks.length.toLong)
      }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = tf.groupBy(_._1).map { case (id, rows) =>
      val scoreFx = rows.map { case (_, w, f, dl) =>
        val idf = mlog2(n) - mlog2(df(w))
        val den = 10 * f + 3 + 9 * dl * n / t
        idf * 22 * f / den
      }.sum
      id -> (rows.size.toLong, scoreFx)
    }
    val top = expected.toSeq.sortBy { case (id, (_, s)) => (-s, id) }.take(20)

    val got = SparkEntry.queries("search_bm25")(spark, sfDir)
      .select("doc_id", "n_hits", "score_fx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === top.map { case (id, (h, s)) => (id, h, s) })
  }

  test("tfidf cosine equals a pure-Scala reimplementation of the integer pipeline") {
    val docs = docTokens()
    val n = docs.size.toLong
    val tfAll = docs.toSeq.flatMap { case (id, toks) =>
      // empty tokens are not vocabulary — same filter as the query
      toks.filter(_.nonEmpty).groupBy(identity)
        .map { case (w, o) => (id, w, o.length.toLong) }
    }
    val df = tfAll.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def idf(w: String): Long = mlog2(n) - mlog2(df(w))
    val wfx = tfAll.map { case (id, w, tf) => (id, w) -> tf * idf(w) / 1024 }.toMap
    val nd = wfx.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(x => x._2 * x._2).sum).toMap
    val terms = Search.QueryTerms.filter(df.contains)
    val qw = terms.map(w => w -> idf(w) / 1024).toMap
    val nq = qw.values.map(v => v * v).sum
    val expected = docs.keys.toSeq.flatMap { id =>
      val hits = terms.filter(w => wfx.contains((id, w)))
      if (hits.isEmpty) None
      else {
        val dot = hits.map(w => qw(w) * wfx((id, w))).sum
        val cos = dot.toDouble /
          (math.sqrt(nq.toDouble) * math.sqrt(nd(id).toDouble))
        Some((id, hits.size.toLong, math.floor(cos * 1e4 + 0.5).toLong))
      }
    }
    val top = expected.sortBy { case (id, _, s) => (-s, id) }.take(20)

    val got = SparkEntry.queries("search_tfidf_cosine")(spark, sfDir)
      .select("doc_id", "n_hits", "score_fx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === top)
    // cosines are genuine: in (0, 1] and the head is non-trivial
    assert(top.nonEmpty && top.forall { case (_, _, s) => s > 0 && s <= 10000 })
  }

  test("persisted bm25 index: probe ≡ inline row-for-row, postings partition-pruned") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val inline = SparkEntry.queries("search_bm25")(spark, sfDir).collect().toSeq
    val dfIdx = SparkEntry.queries("search_bm25_indexed")(spark, sfDir)
    val indexed = dfIdx.collect().toSeq
    assert(indexed.map(_.toSeq) === inline.map(_.toSeq),
      "persisted-index probe diverged from the inline query")
    // the SAME index serves the TF-IDF ranker: persisted ≡ inline there too
    val tfInline = SparkEntry.queries("search_tfidf_cosine")(spark, sfDir)
      .collect().toSeq
    val tfIndexed = SparkEntry.queries("search_tfidf_indexed")(spark, sfDir)
      .collect().toSeq
    assert(tfIndexed.map(_.toSeq) === tfInline.map(_.toSeq),
      "persisted tfidf probe diverged from the inline query")
    // the probe reads ONLY the query terms' posting partitions
    val scans = flattenPlan(dfIdx.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("postings")) => f
    }
    assert(scans.nonEmpty, "no scan over the postings index found")
    scans.foreach { scan =>
      assert(scan.partitionFilters.nonEmpty,
        "postings scan must carry a term partition filter:\n" + scan.toString)
      val parts = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
      assert(parts.length <= Search.QueryTerms.size,
        s"probe read ${parts.length} term partitions, expected <= ${Search.QueryTerms.size}")
    }
  }

  test("tfidf persisted ≡ inline on a corpus with empty split tokens") {
    // double spaces split into empty tokens; they are NOT vocabulary —
    // the stored norms and the inline norms must agree on that (the
    // empty-token filter lives in both paths; this pins it)
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tfidx-empty").toString
    Seq((1L, "spark  join vector"), (2L, "window  spark spark"),
      (3L, " join window "), (4L, "vector plain words"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val inline = SparkEntry.queries("search_tfidf_cosine")(spark, tmp)
      .collect().toSeq
    val indexed = SparkEntry.queries("search_tfidf_indexed")(spark, tmp)
      .collect().toSeq
    assert(inline.nonEmpty)
    assert(indexed.map(_.toSeq) === inline.map(_.toSeq),
      "empty split tokens desynced the stored norms from the inline query")
  }

  test("segmented postings: stop-word rows are bounded, probe ≡ inline across segments") {
    // synthetic stop-word corpus: 'the' appears in EVERY doc, so its
    // posting list is corpus-sized — exactly the Zipf-head row the
    // segmentation exists to bound (one unbounded row = one >2GB task
    // at 100 TB). Build with a tiny doc_id range so the fixture
    // actually exercises multi-segment terms.
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tfidx-seg").toString
    val docs = (0L until 64L).map { i =>
      val extra = if (i % 3 == 0) "spark join" else if (i % 3 == 1) "vector" else "window"
      (i, s"the quick doc $i has the $extra terms the end")
    }
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val range = 8L
    val idx = s"$tmp/idx"
    Search.buildTextIndex(
      spark.read.parquet(s"$tmp/documents.parquet"), idx, segmentDocRange = range)
    val post = spark.read.parquet(s"$idx/postings")
    // every stored row's postings are bounded by the segment width
    val maxRow = post.select(max(size(col("postings")))).head().getInt(0)
    assert(maxRow <= range,
      s"a posting row holds $maxRow postings, exceeding the $range-doc segment bound")
    // the stop word genuinely spans segments (the test would be vacuous
    // if everything landed in one)
    val theSegs = post.filter(col("term") === "the")
      .select("segment").distinct().count()
    assert(theSegs == 8, s"'the' spans $theSegs segments, expected 8")
    // total df is denormalized identically on every segment row
    val dfVals = post.filter(col("term") === "the")
      .select("df").distinct().collect().map(_.getLong(0))
    assert(dfVals.toSeq == Seq(64L), s"df per segment row: ${dfVals.toSeq}")
    // probing across segments reproduces the inline rankers row-for-row
    val bmInline = SparkEntry.queries("search_bm25")(spark, tmp).collect().toSeq
    val bmProbe = Search.probeTextIndex(spark, idx, Search.QueryTerms).collect().toSeq
    assert(bmProbe.map(_.toSeq) === bmInline.map(_.toSeq),
      "segmented bm25 probe diverged from inline")
    val tfInline = SparkEntry.queries("search_tfidf_cosine")(spark, tmp).collect().toSeq
    val tfProbe = Search.probeTfidfIndex(spark, idx, Search.QueryTerms).collect().toSeq
    assert(tfProbe.map(_.toSeq) === tfInline.map(_.toSeq),
      "segmented tfidf probe diverged from inline")
  }

  test("boilerplate strip equals a pure-Scala reimplementation; text is a subsequence") {
    val docs = docTokens()
    val g = Search.GramW
    val grams = docs.toSeq.flatMap { case (id, toks) =>
      (0 to toks.length - g).map(i => (id, i, toks.slice(i, i + g).mkString(" ")))
    }
    val top = grams.groupBy(_._3).view.mapValues(_.size).toSeq
      .sortBy { case (gr, c) => (-c, gr) }.take(Search.BoilerK).map(_._1).toSet
    val expected = docs.map { case (id, toks) =>
      val cut = grams.filter(r => r._1 == id && top(r._3))
        .flatMap(r => r._2 until r._2 + g).toSet
      val kept = toks.zipWithIndex.collect { case (w, i) if !cut(i) => w }
      id -> (toks.length, toks.length - kept.length, kept.mkString(" "))
    }

    val got = SparkEntry.queries("text_boilerplate_strip")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got === expected)

    // cleaned text is a subsequence of the original tokens
    got.foreach { case (id, (_, _, clean)) =>
      val orig = docs(id).iterator
      assert(clean.split(" ").filter(_.nonEmpty).forall(w => orig.contains(w)),
        s"doc $id clean text is not a subsequence")
    }
  }

  test("hamming ann: sign words and top-1 match a driver-side brute force") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sig(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach(i => if (v(i) > 0) lo |= 1L << i)
      (32 until 64).foreach(i => if (v(i) > 0) hi |= 1L << (i - 32))
      (lo, hi)
    }
    val sigs = emb.view.mapValues(sig).toMap

    val sparkSigs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("aggregate(sequence(0, 31), cast(0 as bigint), (acc, i) -> " +
          "acc + (CASE WHEN embedding[i] > 0 THEN shiftleft(cast(1 as bigint), i) " +
          "ELSE cast(0 as bigint) END))").as("lo"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs.foreach { case (id, (lo, _)) => assert(sparkSigs(id) === lo) }

    val got = SparkEntry.queries("ann_hamming_topk")(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(4))) // query, neighbor, ham
    got.foreach { case (q, nb, ham) =>
      val (qlo, qhi) = sigs(q)
      val best = sigs.view.filterKeys(_ != q).map { case (id, (lo, hi)) =>
        (java.lang.Long.bitCount(lo ^ qlo) + java.lang.Long.bitCount(hi ^ qhi), id)
      }.min
      assert((ham, nb) === best, s"query $q")
    }
  }
}
