package graft.plans

import graft.functions.{ArrayDotDouble, ArrayDotLong, ArrayDotTiny, ArrayMd5, CosineSimilarity, SimHash64, SrpBandCodes}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions: registers the engine's native expressions so SQL
 * users get them too (`SELECT cosine_similarity(a, b)`). Install with
 *
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)          // or
 *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
 *
 * Kept to genuinely-needed surface: no custom Rule/Strategy exists
 * because Catalyst already plans everything this engine declares
 * (SURVEY.md §7.3 decision table).
 */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def binary(name: String, cls: Class[_],
      build: (Expression, Expression) => Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      build(args.head, args(1))
    })

  private def unary(name: String, cls: Class[_],
      build: Expression => Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      build(args.head)
    })

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an INT literal, got $other")
  }

  /** A foldable ARRAY<STRING> argument (e.g. `array('a','b')`),
    * constant-evaluated at function-resolution time — redaction rules
    * are plan constants, never per-row data. */
  private def stringArrayLit(e: Expression, what: String): Seq[String] = {
    import org.apache.spark.sql.types.StringType
    require(e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType == StringType,
      s"$what must be a foldable ARRAY<STRING>, got $e")
    val evaluated = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    // A foldable NULL of array type (CAST(NULL AS ARRAY<STRING>)) passes
    // the type check but evaluates to null — fail with the same message
    // instead of an NPE on numElements().
    require(evaluated != null, s"$what must be a foldable ARRAY<STRING>, got $e")
    val a = evaluated.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until a.numElements()).map { i =>
      require(!a.isNullAt(i), s"$what must not contain nulls")
      a.getUTF8String(i).toString
    }
  }

  private[plans] val descriptors: Seq[Descriptor] = Seq(
    binary("cosine_similarity", classOf[CosineSimilarity], CosineSimilarity.apply),
    binary("dot_double", classOf[ArrayDotDouble], ArrayDotDouble.apply),
    binary("dot_long", classOf[ArrayDotLong], ArrayDotLong.apply),
    binary("dot_tiny", classOf[ArrayDotTiny], ArrayDotTiny.apply),
    binary("array_md5", classOf[ArrayMd5], ArrayMd5.apply),
    unary("simhash64", classOf[SimHash64], SimHash64.apply),
    (FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(classOf[graft.functions.NearestCentroid].getName,
        "nearest_centroid"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"nearest_centroid expects (cents, vec, nrm), got ${args.length} args")
        graft.functions.NearestCentroid(args.head, args(1), args(2))
      }),
    binary("nearest_code", classOf[graft.functions.NearestCode],
      (a: Expression, b: Expression) => graft.functions.NearestCode(a, b)),
    (FunctionIdentifier("srp_band_codes"),
      new ExpressionInfo(classOf[SrpBandCodes].getName, "srp_band_codes"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"srp_band_codes expects (embedding, rowsPerBand, nBands), got ${args.length} args")
        SrpBandCodes(args.head,
          intLit(args(1), "rowsPerBand"), intLit(args(2), "nBands"))
      }),
    // regexp_redact_chain(text) — the default PII chain; or
    // regexp_redact_chain(text, names, patterns, replacements) with
    // three equal-length ARRAY<STRING> literals (rules are plan data)
    (FunctionIdentifier("regexp_redact_chain"),
      new ExpressionInfo(classOf[graft.functions.RegexpRedactChain].getName,
        "regexp_redact_chain"),
      (args: Seq[Expression]) => args.length match {
        case 1 => graft.functions.RegexpRedactChain(args.head,
          graft.operators.Redaction.DefaultRules
            .map(r => (r.name, r.pattern, r.replacement)))
        case 4 =>
          val names = stringArrayLit(args(1), "rule names")
          val pats = stringArrayLit(args(2), "rule patterns")
          val reps = stringArrayLit(args(3), "rule replacements")
          require(names.length == pats.length && pats.length == reps.length &&
            names.nonEmpty,
            "regexp_redact_chain needs three equal-length, non-empty rule arrays")
          graft.functions.RegexpRedactChain(args.head,
            names.indices.map(i => (names(i), pats(i), reps(i))))
        case n => throw new IllegalArgumentException(
          s"regexp_redact_chain expects (text) or (text, names, patterns, replacements), got $n args")
      }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
