package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row

/** Rule-level behavior of the Gopher gate battery on docs built to trip
  * each rule individually — the sf corpus is single-line and clean, so
  * the oracle row alone never exercises the line rules or the bounds. */
class GopherRulesSuite extends SparkSuite {

  private def flags(text: String): Row = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    TextAnalysis.gopherRules(df).collect().head
  }

  private def flag(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  private val fiftyGood =
    (1 to 50).map(i => s"word${i % 7} the of and that").mkString(" ")

  test("clean 50+-word prose passes every rule") {
    val r = flags(fiftyGood)
    for (f <- Seq("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords", "passes_gopher"))
      assert(flag(r, f), s"$f should pass: $r")
  }

  test("short docs fail word count; digit soup fails alpha ratio; no stopwords fails") {
    assert(!flag(flags("too short the of"), "ok_word_count"))
    val digits = (1 to 60).map(i => s"${i * 31}").mkString(" ") + " the of"
    assert(!flag(flags(digits), "ok_alpha_words"))
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ")
    assert(!flag(flags(noStops), "ok_stopwords"))
  }

  test("symbol rules: hash-heavy and ellipsis-heavy text fails") {
    val hashy = (1 to 60).map(_ => "## the").mkString(" ")
    assert(!flag(flags(hashy), "ok_symbol_ratio"))
    val ellipy = (1 to 60).map(_ => "so... the").mkString(" ")
    assert(!flag(flags(ellipy), "ok_symbol_ratio"))
  }

  test("line rules: bullet-dominated and ellipsis-terminated lines fail") {
    val bullets = (1 to 20).map(i => s"- item $i the of and").mkString("\n")
    assert(!flag(flags(bullets), "ok_bullet_lines"))
    val trailing = (1 to 20).map(i => s"line $i the of and...").mkString("\n")
    assert(!flag(flags(trailing), "ok_ellipsis_lines"))
  }

  test("mean word length bounds: single-letter soup fails low") {
    val tiny = (1 to 60).map(_ => "a b").mkString(" ") + " the of"
    assert(!flag(flags(tiny), "ok_mean_word_len"))
  }
}
