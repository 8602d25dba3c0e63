package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `regexp_redact_chain(text)` — an ordered redaction rule chain as ONE
 * native expression: `STRUCT<redacted: STRING, n_<rule>: INT, ...>`.
 *
 * Why it exists (r14 profile, the `text_pii_redact` hot path): the
 * composable form folds `regexp_replace` + `regexp_count` per rule,
 * which walks the regex automaton over every row once PER EXPRESSION —
 * 8 passes for the 5-rule default chain (3 counts survive pruning) —
 * and converts UTF8String↔String at every step. This expression runs
 * the identical sequential chain in one call: one `toString`, one
 * find-loop per rule that REPLACES AND COUNTS in the same traversal
 * (the count of a rule is exactly the number of replacements it makes
 * on the text state it sees — same numbers as counting first), rows
 * with no match pay no string rebuild. Patterns compile once per
 * expression instance, not per row (`@transient lazy` + a codegen
 * reference object). Semantics are byte-identical to the folded form,
 * so the DuckDB oracle replaying the chain verbatim is untouched
 * (RedactExpressionsSuite pins equality against the composable form).
 *
 * Rules are constructor DATA (name, pattern, replacement), not child
 * expressions — a deployment ships its own chain; the pattern dialect
 * contract (Java∩RE2, no backreferences/lookaround) is the operator's
 * ([[graft.operators.Redaction]]).
 */
final case class RegexpRedactChain(
    child: Expression, rules: Seq[(String, String, String)])
  extends UnaryExpression {

  require(rules.nonEmpty, "regexp_redact_chain needs at least one rule")
  // Replacements are appended LITERALLY (no $1 group references, no \
  // escapes) — redaction tokens by design. The composable
  // regexp_replace fold and the DuckDB twin would both interpret those
  // metacharacters, so a rule carrying them would silently diverge
  // from its oracle; fail at construction instead.
  rules.foreach { case (n, _, repl) =>
    require(!repl.contains("$") && !repl.contains("\\"),
      s"rule '$n': replacement '$repl' contains $$ or \\ — replacements " +
        "are literal tokens (group references are not supported)")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(
    StructField("redacted", StringType, nullable = false) +:
      rules.map(r => StructField(s"n_${r._1}", IntegerType, nullable = false)))

  override def prettyName: String = "regexp_redact_chain"

  @transient private lazy val patterns: Array[java.util.regex.Pattern] =
    rules.map(r => java.util.regex.Pattern.compile(r._2)).toArray
  @transient private lazy val replacements: Array[String] =
    rules.map(_._3).toArray

  override protected def nullSafeEval(t: Any): Any =
    RedactOps.redactChain(t.asInstanceOf[UTF8String], patterns, replacements)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("redactPatterns", patterns,
      "java.util.regex.Pattern[]")
    val rs = ctx.addReferenceObj("redactRepls", replacements,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RedactOps.redactChain($t, $ps, $rs);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpRedactChain =
    copy(child = newChild)
}

object RedactOps {
  /** The sequential chain: for each rule in order, count + replace every
    * match of its pattern in the CURRENT text state. One automaton
    * traversal per rule; no rebuild when a rule matches nothing. */
  def redactChain(text: UTF8String,
      patterns: Array[java.util.regex.Pattern],
      replacements: Array[String]): InternalRow = {
    var s = text.toString
    val n = patterns.length
    val out = new Array[Any](n + 1)
    var i = 0
    while (i < n) {
      val m = patterns(i).matcher(s)
      var cnt = 0
      if (m.find()) {
        val sb = new java.lang.StringBuilder(s.length + 16)
        var last = 0
        while ({
          cnt += 1
          sb.append(s, last, m.start())
          sb.append(replacements(i))
          last = m.end()
          m.find()
        }) ()
        sb.append(s, last, s.length)
        s = sb.toString
      }
      out(i + 1) = cnt
      i += 1
    }
    out(0) = UTF8String.fromString(s)
    new GenericInternalRow(out)
  }
}
