package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RedactionSuite extends SparkSuite {

  private def redactOne(s: String): (String, Map[String, Int]) = {
    val sparkS = spark
    import sparkS.implicits._
    val row = Redaction.redactWithCounts(
      Seq(s).toDF("txt"), "txt", "out").head()
    val counts = Redaction.DefaultRules.map(r =>
      r.name -> row.getAs[Int](s"n_${r.name}")).toMap
    (row.getAs[String]("out"), counts)
  }

  test("each default rule masks its shape; counts reflect actual replacements") {
    val (out, n) = redactOne(
      "mail a.b+c@ex-ample.co.uk from 192.168.0.1 phone 25-989-741-2988 " +
        "ssn 123-45-6789 and 42 things")
    assert(out ===
      "mail [EMAIL] from [IP] phone [PHONE] ssn [SSN] and [NUM] things")
    assert(n("email") === 1)
    assert(n("ip") === 1)
    assert(n("phone") === 1)
    assert(n("ssn") === 1)
    assert(n("number") === 1)
  }

  test("rule order protects specific shapes from the bare-number rule") {
    // numbers inside an email/ip/phone are consumed by THEIR rule, so
    // n_number only counts the leftover bare ones
    val (out, n) = redactOne("x 7 y 10.0.0.1 z u9@d.io")
    assert(out === "x [NUM] y [IP] z [EMAIL]")
    assert(n("number") === 1)
    assert(n("ip") === 1)
    assert(n("email") === 1)
  }

  test("multiple matches of one rule are all replaced and all counted") {
    val (out, n) = redactOne("a@b.cc c@d.ee 1.2.3.4 5.6.7.8 11 22 33")
    assert(out === "[EMAIL] [EMAIL] [IP] [IP] [NUM] [NUM] [NUM]")
    assert(n("email") === 2)
    assert(n("ip") === 2)
    assert(n("number") === 3)
  }

  test("clean text is untouched with all-zero counts") {
    val (out, n) = redactOne("no pii here at all")
    assert(out === "no pii here at all")
    assert(n.values.forall(_ === 0))
  }

  test("custom rule chains work and order is respected") {
    val sparkS = spark
    import sparkS.implicits._
    val rules = Seq(
      Redaction.RedactionRule("word", "cat", "<PET>"),
      Redaction.RedactionRule("vowel", "[aeiou]", "_"))
    val out = Seq("a cat sat").toDF("txt")
      .select(Redaction.redactColumn(col("txt"), rules).as("out"))
      .head().getString(0)
    // "cat" is taken by the first rule before the vowel rule sees it
    assert(out === "_ <PET> s_t")
  }

  test("the chain runs unchanged on a stream (pure narrow work per micro-batch)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val out = Redaction.redactWithCounts(
      input.toDS().toDF("id", "txt"), "txt", "out")
    val q = out.writeStream.format("memory").queryName("redact_stream").start()
    try {
      input.addData((1L, "mail a@b.cc now"), (2L, "clean"))
      q.processAllAvailable()
      input.addData((3L, "ip 1.2.3.4"))
      q.processAllAvailable()
      val got = spark.table("redact_stream")
        .select("id", "out", "n_email", "n_ip").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
        .toMap
      assert(got(1L) === (("mail [EMAIL] now", 1, 0)))
      assert(got(2L) === (("clean", 0, 0)))
      assert(got(3L) === (("ip [IP]", 0, 1)))
    } finally q.stop()
  }

  test("word boundaries guard alphanumeric adjacency; dotted-run prefix is the documented trade") {
    // \b blocks a match that would start inside an alphanumeric run...
    val (alnum, nA) = redactOne("v1.2.3.4 x")
    assert(nA("ip") === 0, alnum)
    // ...same for the phone rule: an interior substring of a longer
    // digit-dash run is NOT a phone
    val (ph, nP) = redactOne("id 3125-989-741-29887 x")
    assert(nP("phone") === 0, ph)
    // ...but cannot stop a prefix match inside a LONGER dotted run
    // (lookbehind isn't RE2-portable — see DefaultRules scaladoc)
    val (out, n) = redactOne("v 1.2.3.4.5 real 9.9.9.9 done")
    assert(n("ip") === 2)
    assert(out === "v [IP].[NUM] real [IP] done")
  }
}
