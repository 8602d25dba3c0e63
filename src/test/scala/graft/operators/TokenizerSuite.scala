package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}

/** Engine-independent pin for BPE merge learning: a pure-Scala
  * reimplementation of the same semantics (char start state, weighted
  * pair counts, lexicographic tie-break, single-pass left-to-right
  * non-overlapping rewrite) replayed on the driver and compared
  * merge-for-merge. */
class TokenizerSuite extends SparkSuite {

  test("bpe merges equal a pure-Scala replay of the defined semantics") {
    val words = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    var vocab: Map[String, Long] = words.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
      .map { case (w, c) => w.toCharArray.mkString(" ") -> c }
    val expected = (1 to 5).map { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (seg, c) =>
        seg.split(" ").sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val ((l, r), c) = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
      vocab = vocab.map { case (seg, wc) =>
        (s" $seg ".replace(s" $l $r ", s" $l$r ").trim, wc)
      }.groupBy(_._1).view.mapValues(_.values.sum).toMap
      (rank, l, r, c)
    }

    val got = SparkEntry.queries("vocab_bpe_merges")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("bpe encode equals a pure-Scala replay applied per word") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val wcnt = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    var seg: Map[String, String] =
      wcnt.keys.map(w => w -> w.toCharArray.mkString(" ")).toMap
    (1 to 5).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (w, s) =>
        s.split(" ").sliding(2).foreach {
          case Array(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + wcnt(w)
          case _ =>
        }
      }
      val ((l, r), _) = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
      seg = seg.map { case (w, s) =>
        w -> s" $s ".replace(s" $l $r ", s" $l$r ").trim
      }
    }
    val units = seg.map { case (w, s) => w -> s.split(" ").length.toLong }
    val expected = docs.map { case (id, toks) =>
      (id, toks.length.toLong, toks.map(units).sum)
    }.sortBy(_._1).toSeq

    val got = SparkEntry.queries("tokenize_bpe_encode")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // units are never FEWER than words (each word is at least one unit)
    expected.foreach { case (id, words, bpe) =>
      assert(bpe >= words, s"doc $id has fewer units than words")
    }
  }
}
