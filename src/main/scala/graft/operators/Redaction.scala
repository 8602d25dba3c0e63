package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PII detection + redaction for training-data pipelines: a configurable
 * ordered rule chain (email, IPv4, phone, SSN, bare number by default),
 * each rule a regex → replacement-token pair applied with
 * `regexp_replace` — pure per-row narrow work, zero shuffle, fully
 * inside whole-stage codegen (Spark's regexp expressions are codegen'd
 * and cache the compiled Pattern per task).
 *
 * Rule ORDER is part of the contract: rules apply sequentially to the
 * progressively-redacted text, so specific shapes must precede general
 * ones (an email is redacted as `[EMAIL]` before the bare-number rule
 * could eat its digits). Match counts are per-rule matches ACTUALLY
 * replaced (counted on the text state each rule sees), which is the
 * number an auditing pipeline wants.
 *
 * Pattern dialect: every default pattern restricts itself to the
 * intersection of Java regex and RE2 (character classes, bounded
 * repetition, `\b` ASCII word boundaries — no backreferences, no
 * lookaround), so the DuckDB oracle replays the chain verbatim and
 * engines agree byte-for-byte.
 *
 * At 100 TB: per-row regex chains are scan-bound; the only design rule
 * that matters is staying narrow (no shuffle, no UDF serialization) and
 * keeping patterns anchored/linear so RE2-class engines stay O(n) per
 * row. Rules are data (name/pattern/replacement), so a deployment ships
 * its own chain without touching the operator.
 */
object Redaction {

  /** One redaction rule: matches of `pattern` become `replacement`. */
  final case class RedactionRule(name: String, pattern: String, replacement: String)

  /** Default chain, most-specific first. `\b` guards keep the
    * IPv4/phone/SSN rules from starting or ending inside an alphanumeric
    * run (`x1.2.3.4` is not an IP, `3125-989-741-29887` contains no
    * phone); they can NOT stop a prefix match inside a longer DOTTED run
    * (`1.2.3.4.5` → `[IP].5` — a word boundary exists between digit and
    * dot, and the lookbehind that would fix it is not in RE2, so it
    * would break oracle portability — documented trade). The phone shape
    * is the TPC-H `nn-nnn-nnn-nnnn` layout; the bare-number rule LAST. */
  val DefaultRules: Seq[RedactionRule] = Seq(
    RedactionRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    RedactionRule("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    RedactionRule("phone", "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "[PHONE]"),
    RedactionRule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    RedactionRule("number", "[0-9]+", "[NUM]"))

  /** The redacted text: the full rule chain over `text`, as the ONE
    * native chain expression (one automaton pass per rule, one string
    * conversion total — see [[graft.functions.RegexpRedactChain]]). */
  def redactColumn(text: Column, rules: Seq[RedactionRule] = DefaultRules): Column = {
    import org.apache.spark.sql.graft.Shim
    Shim.column(graft.functions.RegexpRedactChain(
      Shim.expression(text), rules.map(r => (r.name, r.pattern, r.replacement))))
      .getField("redacted")
  }

  /** The composable `regexp_replace` fold of the same chain — the
    * definitional form [[redactColumn]] must stay byte-identical to
    * (RedactExpressionsSuite pins it); also the shape the DuckDB twin
    * [[redactSql]] mirrors clause-for-clause. */
  private[graft] def redactColumnComposable(
      text: Column, rules: Seq[RedactionRule] = DefaultRules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, lit(r.pattern), lit(r.replacement)))

  /** DuckDB twin of [[redactColumn]]: the same chain folded over a SQL
    * expression — shared with the curation pipeline's oracle. */
  private[operators] def redactSql(
      e: String, rules: Seq[RedactionRule] = DefaultRules): String =
    rules.foldLeft(e)((c, r) =>
      s"regexp_replace($c, '${r.pattern}', '${r.replacement}', 'g')")

  /** `df` plus `<out>` (redacted text) and one `n_<rule>` count column
    * per rule — counts taken on the text state the rule actually saw.
    * Runs the chain through [[graft.functions.RegexpRedactChain]]: one
    * native expression, one automaton pass per rule that replaces and
    * counts together (the composable regexp_replace/regexp_count fold —
    * kept as [[redactColumn]] and pinned equal by the suite — walks the
    * text once per expression instead). */
  def redactWithCounts(
      df: DataFrame, textCol: String, out: String,
      rules: Seq[RedactionRule] = DefaultRules): DataFrame = {
    import org.apache.spark.sql.graft.Shim
    val packed = Shim.column(graft.functions.RegexpRedactChain(
      Shim.expression(col(textCol)),
      rules.map(r => (r.name, r.pattern, r.replacement))))
    df.withColumn("__redact_packed", packed)
      .select(df.columns.map(col).toSeq ++
        rules.map(r =>
          col("__redact_packed").getField(s"n_${r.name}").as(s"n_${r.name}")) :+
        col("__redact_packed").getField("redacted").as(out): _*)
  }

  // ---- oracle-gated demonstration query -------------------------------

  // The synthetic tables carry no real PII, so the demo formats REAL
  // columns into PII-shaped text deterministically (same expression in
  // both engines) — the chain then has true emails/IPs/numbers to find,
  // and the counts are non-vacuous. The operator itself is the general
  // rule-chain above; only this fixture text is query-specific.
  private val piiRedact = QueryDef(
    (s, dir) => {
      // measured r20: spreading events off its 1-task fixture scan read
      // 2.5 → 3.4 s and was rejected. RE-MEASURED r21 (interleaved A/B,
      // two reps each): the spread WINS 1.8 → 1.15 s — the r20 numbers
      // were host noise (that session documented ±40% cross-run swings
      // on identical code). Adopted: the five-automaton chain is the
      // heaviest per-row work in the events family, and the spread
      // vanishes at scale by construction.
      val base = Tables.spread(s, dir, "events").select(col("event_id"),
        concat(
          lit("user "), col("user_id").cast("string"),
          lit(" at 10."), (col("user_id") % 200).cast("string"),
          lit("."), (col("event_id") % 250).cast("string"),
          lit("."), ((col("event_id") * 7) % 250).cast("string"),
          lit(" mail u"), col("user_id").cast("string"),
          lit("@example.com ref "), col("event_id").cast("string")).as("txt"))
      redactWithCounts(base, "txt", "redacted")
        .select("event_id", "redacted", "n_email", "n_ip", "n_number")
        .orderBy("event_id")
    },
    Some {
      val Seq(email, ip, phone, ssn, number) = DefaultRules
      s"""WITH base AS (
        |  SELECT event_id,
        |    'user ' || CAST(user_id AS VARCHAR) ||
        |    ' at 10.' || CAST(user_id % 200 AS VARCHAR) ||
        |    '.' || CAST(event_id % 250 AS VARCHAR) ||
        |    '.' || CAST((event_id * 7) % 250 AS VARCHAR) ||
        |    ' mail u' || CAST(user_id AS VARCHAR) ||
        |    '@example.com ref ' || CAST(event_id AS VARCHAR) AS txt
        |  FROM events),
        |s1 AS (SELECT event_id,
        |  CAST(len(regexp_extract_all(txt, '${email.pattern}')) AS INT) AS n_email,
        |  regexp_replace(txt, '${email.pattern}', '[EMAIL]', 'g') AS t
        |  FROM base),
        |s2 AS (SELECT event_id, n_email,
        |  CAST(len(regexp_extract_all(t, '${ip.pattern}')) AS INT) AS n_ip,
        |  regexp_replace(t, '${ip.pattern}', '[IP]', 'g') AS t
        |  FROM s1),
        |s3 AS (SELECT event_id, n_email, n_ip,
        |  regexp_replace(t, '${phone.pattern}', '[PHONE]', 'g') AS t FROM s2),
        |s4 AS (SELECT event_id, n_email, n_ip,
        |  regexp_replace(t, '${ssn.pattern}', '[SSN]', 'g') AS t FROM s3),
        |s5 AS (SELECT event_id, n_email, n_ip,
        |  CAST(len(regexp_extract_all(t, '${number.pattern}')) AS INT) AS n_number,
        |  regexp_replace(t, '${number.pattern}', '[NUM]', 'g') AS redacted
        |  FROM s4)
        |SELECT event_id, redacted, n_email, n_ip, n_number
        |FROM s5 ORDER BY event_id""".stripMargin
    })

  val all: Map[String, QueryDef] = Map(
    "text_pii_redact" -> piiRedact)
}
