package graft.operators

import graft.SparkSuite

/** The content-defined-anchor contract of span dedup: occurrences of the
  * same run align REGARDLESS of their doc-relative offsets — the exact
  * case the fixed-stride first draft missed ~7/8 of the time. */
class DedupSpansSuite extends SparkSuite {

  /** Same anchor rule as the operator, on the driver. */
  private def anchors(tok: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    (((d(0) >> 4) & 0xf) % 8) == 0
  }

  test("a shared run at DIFFERENT offsets in two docs is detected, spans aligned") {
    val sparkS = spark
    import sparkS.implicits._
    // a 24-token run whose FIRST token anchors (so a window at the run's
    // head exists in every occurrence); fillers chosen to NOT anchor so
    // no accidental windows straddle into agreement by luck
    val anchorTok = Iterator.from(0).map(i => s"t$i").find(anchors).get
    val nonA = Iterator.from(0).map(i => s"f$i").filterNot(anchors).take(40).toSeq
    val run = (anchorTok +: nonA.take(23)).mkString(" ")
    val docA = run + " " + nonA.slice(23, 33).mkString(" ")          // offset 0
    val docB = nonA.slice(33, 40).mkString(" ") + " " + run          // offset 7
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")

    val got = Dedup.duplicatedSpans(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // the run's head window collides across both docs at run-relative 0:
    // doc 1 span_start 0, doc 2 span_start 7 — different offsets, same
    // fingerprint
    assert(got.contains((1L, 0, 2L)), got.toSeq.toString)
    assert(got.contains((2L, 7, 2L)), got.toSeq.toString)
  }

  test("spanCut keeps the first occurrence, cuts the rest, leaves clean docs intact") {
    val sparkS = spark
    import sparkS.implicits._
    val anchorTok = Iterator.from(0).map(i => s"t$i").find(anchors).get
    val nonA = Iterator.from(0).map(i => s"f$i").filterNot(anchors).take(60).toSeq
    val run = (anchorTok +: nonA.take(23)).mkString(" ")
    val docA = run + " " + nonA.slice(23, 33).mkString(" ")          // first occ: kept
    val docB = nonA.slice(33, 40).mkString(" ") + " " + run          // later occ: cut
    val docC = nonA.slice(40, 60).mkString(" ")                      // no dup spans
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")

    val got = Dedup.spanCut(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // doc 1 holds the min-(doc_id, span_start) occurrence — untouched
    assert(got(0)._3 === 0)
    assert(got(0)._4 === docA)
    // doc 2's duplicated 16-token window (span_start 7) is cut exactly
    assert(got(1)._3 === 16, got(1).toString)
    val expectB = (docB.split(" ").zipWithIndex.collect {
      case (t, i) if i < 7 || i >= 23 => t
    }).mkString(" ")
    assert(got(1)._4 === expectB)
    // untouched doc round-trips byte-identical through the token rebuild
    assert(got(2)._3 === 0)
    assert(got(2)._4 === docC)
    // token accounting: n_tokens is the ORIGINAL count on every row
    assert(got(0)._2 === docA.split(" ").length)
    assert(got(1)._2 === docB.split(" ").length)
  }

  test("spanCut unions overlapping cut spans instead of double-counting") {
    val sparkS = spark
    import sparkS.implicits._
    // two anchors 8 apart inside one shared 32-token run → two duplicated
    // windows overlapping by 8 tokens in the cut doc; the union covers 24
    // tokens, not 32
    val anchorToks = Iterator.from(0).map(i => s"t$i").filter(anchors).take(2).toSeq
    val nonA = Iterator.from(0).map(i => s"f$i").filterNot(anchors).take(60).toSeq
    val run = (anchorTok(anchorToks, 0) +: nonA.take(7)) ++
      (anchorTok(anchorToks, 1) +: nonA.slice(7, 14)) ++ nonA.slice(14, 30)
    val runS = run.mkString(" ")
    val docA = runS + " " + nonA.slice(30, 40).mkString(" ")
    val docB = nonA.slice(40, 45).mkString(" ") + " " + runS
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val got = Dedup.spanCut(docs).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(got(1L) === 0)
    assert(got(2L) === 24, got.toString) // 8 overlap: 16 + 16 − 8
  }

  private def anchorTok(s: Seq[String], i: Int): String = s(i)

  test("runs present in only one doc are not reported") {
    val sparkS = spark
    import sparkS.implicits._
    val anchorTok = Iterator.from(0).map(i => s"t$i").find(anchors).get
    val filler = Iterator.from(0).map(i => s"g$i").filterNot(anchors).take(60).toSeq
    val docs = Seq(
      (1L, (anchorTok +: filler.take(20)).mkString(" ")),
      (2L, (anchorTok +: filler.slice(20, 40)).mkString(" "))).toDF("doc_id", "text")
    // both docs anchor at position 0 but their windows differ → no dup
    assert(Dedup.duplicatedSpans(docs).count() === 0L)
  }
}
