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
