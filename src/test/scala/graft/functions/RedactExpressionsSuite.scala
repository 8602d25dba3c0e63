package graft.functions

import graft.SparkSuite
import graft.operators.Redaction
import org.apache.spark.sql.functions._

/** The fused redaction chain expression: byte-identical to the
  * composable regexp_replace/regexp_count fold it replaces (which the
  * DuckDB oracles mirror clause-for-clause), on generated and edge-case
  * texts, counts included. */
class RedactExpressionsSuite extends SparkSuite {

  test("fused chain ≡ composable fold on generated PII-shaped text") {
    val s = spark
    import s.implicits._
    val base = spark.range(0, 2000).selectExpr(
      "id",
      """concat('u', id, '@ex.com ip 10.', id % 256, '.', (id*3) % 256, '.', id % 250,
         ' ph ', id % 90 + 10, '-', id % 900 + 100, '-', id % 900 + 100, '-', id % 9000 + 1000,
         ' n ', id * 37) as txt""")
    val rules = Redaction.DefaultRules
    val fused = Redaction.redactWithCounts(base, "txt", "red", rules)
      .select("id", "red", "n_email", "n_ip", "n_phone", "n_ssn", "n_number")
    val folded = {
      val (result, counts) = rules.foldLeft(
        (col("txt"), Seq.empty[org.apache.spark.sql.Column])) {
        case ((c, acc), r) =>
          (regexp_replace(c, lit(r.pattern), lit(r.replacement)),
            acc :+ regexp_count(c, lit(r.pattern)).cast("int").as(s"n_${r.name}"))
      }
      base.select(Seq(col("id")) ++ Seq(result.as("red")) ++ counts: _*)
        .select("id", "red", "n_email", "n_ip", "n_phone", "n_ssn", "n_number")
    }
    val diff = fused.exceptAll(folded).count() + folded.exceptAll(fused).count()
    assert(diff === 0L, "fused chain diverged from the composable fold")
    // and redactColumn (text only) matches its composable twin
    val tOnly = base.select(Redaction.redactColumn(col("txt")).as("a"),
      Redaction.redactColumnComposable(col("txt")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(tOnly === 0L)
  }

  test("edge cases: empty, no-match, adjacent matches, null text") {
    val s = spark
    import s.implicits._
    val rows = Seq("", "no pii here!", "1a@b.cc2c@d.ee", "5 6 7",
      "10.1.1.1 10.2.2.2", null).toDF("txt")
    val got = Redaction.redactWithCounts(rows, "txt", "red")
      .select("red", "n_email", "n_number").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
    assert(got(0) === (("", 0, 0)))
    assert(got(1) === (("no pii here!", 0, 0)))
    // adjacent emails: greedy local part absorbs up to the boundary the
    // fold would also pick — just pin fold parity, not a literal
    val foldRed = rows.select(
      Redaction.redactColumnComposable(col("txt")).as("r")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got.map(_._1) === foldRed)
    assert(got(5)._1 === null && got(5)._2 === -1, "null text must stay null")
  }

  test("SQL registration: default chain and custom rule arrays") {
    graft.plans.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT regexp_redact_chain('mail a@b.co num 42') AS r").head()
      .getStruct(0)
    assert(row.getAs[String]("redacted") === "mail [EMAIL] num [NUM]")
    assert(row.getAs[Int]("n_email") === 1 && row.getAs[Int]("n_number") === 1)
    val custom = spark.sql(
      """SELECT regexp_redact_chain('x7y', array('digit'), array('[0-9]+'),
        |array('#')).redacted AS r""".stripMargin).head().getString(0)
    assert(custom === "x#y")
    val err = intercept[Exception](spark.sql(
      "SELECT regexp_redact_chain('a', array('x'), array('['), array('!'))").head())
    assert(err.getMessage != null)
    // a foldable NULL array passes the type check but evaluates to null —
    // must fail with the foldable-ARRAY<STRING> message, not an NPE
    // (r14-advice defect)
    val nullArr = intercept[Exception](spark.sql(
      """SELECT regexp_redact_chain('a', CAST(NULL AS ARRAY<STRING>),
        |array('x'), array('!'))""".stripMargin).head())
    val root = Iterator.iterate(nullArr: Throwable)(_.getCause)
      .takeWhile(_ != null).toSeq.last
    assert(!root.isInstanceOf[NullPointerException], root.toString)
    assert(Iterator.iterate(nullArr: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("foldable ARRAY<STRING>"))),
      nullArr.toString)
  }

  test("the chain expression appears ONCE in the optimized plan (no per-field recompute)") {
    // range-backed input — a literal local relation would be folded away
    val base = spark.range(0, 10).selectExpr("concat('a', id, '@b.co ', id) as txt")
    val out = Redaction.redactWithCounts(base, "txt", "red")
    val optimized = out.queryExecution.optimizedPlan.toString
    val hits = "regexp_redact_chain".r.findAllIn(optimized).length
    assert(hits === 1,
      s"chain expression duplicated $hits times in:\n${optimized.take(2000)}")
  }
}
