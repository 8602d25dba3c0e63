package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, LongType}

/**
 * Shared null-ELEMENT propagation for the binary array kernels: a null
 * element on either side ⇒ null result — exactly the HOF forms' truth
 * table (`zip_with` yields a null product, the `aggregate` fold absorbs
 * it). Checks are evaluated/emitted ONLY when the static array type says
 * `containsNull`, so null-free hot paths keep branch-free loops. One
 * definition for all three kernels — a truth-table fix lands everywhere.
 */
private[functions] trait ArrayElementNullPropagation { self: BinaryExpression =>

  protected lazy val leftElemNullable: Boolean = left.dataType match {
    case ArrayType(_, n) => n; case _ => false
  }
  protected lazy val rightElemNullable: Boolean = right.dataType match {
    case ArrayType(_, n) => n; case _ => false
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || leftElemNullable || rightElemNullable

  /** Interpreted-path check for element i; call only in index range. */
  protected final def elemIsNull(x: ArrayData, y: ArrayData, i: Int): Boolean =
    (leftElemNullable && x.isNullAt(i)) || (rightElemNullable && y.isNullAt(i))

  /** In-loop codegen guard ("" when the types can't carry nulls). */
  protected final def elemNullGuard(
      x: String, y: String, i: String, ev: ExprCode): String = {
    val checks = Seq(
      if (leftElemNullable) Some(s"$x.isNullAt($i)") else None,
      if (rightElemNullable) Some(s"$y.isNullAt($i)") else None).flatten
    if (checks.isEmpty) ""
    else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
  }

  /** Post-loop result assignment, skipped when the guard fired. */
  protected final def guardedAssign(ev: ExprCode, value: String): String =
    if (!leftElemNullable && !rightElemNullable) s"${ev.value} = $value;"
    else s"if (!${ev.isNull}) { ${ev.value} = $value; }"
}

/**
 * Native Catalyst expression for cosine similarity over float vectors —
 * the one place (SURVEY.md §7.3) where the built-in surface genuinely
 * under-serves the workload: the HOF form
 * (aggregate(zip_with(...))) evaluates through interpreted lambda
 * dispatch per element, while ANN at 100 TB runs this in the innermost
 * loop of a candidate join. This expression generates a tight primitive
 * loop via doGenCode (no virtual calls, no boxing), and its interpreted
 * eval matches bit-for-bit (same left-to-right accumulation order as the
 * HOF/explicit-SQL forms, so DuckDB oracles still hash-match).
 *
 * Null semantics: null if either side is null (BinaryExpression default)
 * and null if either side CONTAINS a null element — exactly the HOF
 * form's truth table (`zip_with` yields a null product, the `aggregate`
 * fold then absorbs it). The per-element checks are emitted only when
 * the static array type says `containsNull`, so hot internal callers on
 * null-free schemas pay nothing. Mismatched lengths raise, zero-norm
 * vectors yield NaN (caller filters).
 */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ArrayElementNullPropagation {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"cosine_similarity: length mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (elemIsNull(x, y, i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "cosine_similarity: length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemNullGuard(x, y, i, ev)}
         |  final double $xi = (double) $x.getFloat($i);
         |  final double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${guardedAssign(ev,
             s"$dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny))")}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/**
 * `dot_double(x: ARRAY<FLOAT>, w: ARRAY<DOUBLE>)` ≡
 * `aggregate(zip_with(x, w, (a, b) -> CAST(a AS DOUBLE) * b), 0D, (s, v) -> s + v)`
 * — the SRP hyperplane projection, as one native expression.
 *
 * Same motivation and bit-equality contract as [[CosineSimilarity]]: the
 * HOF form pays interpreted lambda dispatch per ELEMENT (16 planes ×
 * 128 dims per row in the SRP signature), while this accumulates the
 * identical left-to-right IEEE sum in a primitive loop — float-cast then
 * multiply then add, in index order, so results (and the md5-pinned
 * banding built on their signs) are bit-for-bit what the HOF and the
 * DuckDB oracle compute.
 *
 * Null semantics match the HOF form exactly: null array ⇒ null, and a
 * null ELEMENT on either side ⇒ null result (the zip_with product is
 * null and the fold absorbs it). Element checks are emitted only when
 * the static array type says `containsNull`, so the hot SRP path on
 * null-free schemas keeps its branch-free loop.
 */
final case class ArrayDotDouble(left: Expression, right: Expression)
    extends BinaryExpression with ArrayElementNullPropagation {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT>, ARRAY<DOUBLE>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_double"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(w.numElements() == n,
      s"dot_double: length mismatch ($n vs ${w.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (elemIsNull(x, w, i)) return null
      s += x.getFloat(i).toDouble * w.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, w) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($w.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot_double: length mismatch (" + $n + " vs " + $w.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemNullGuard(x, w, i, ev)}
         |  $s += ((double) $x.getFloat($i)) * $w.getDouble($i);
         |}
         |${guardedAssign(ev, s)}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotDouble =
    copy(left = newLeft, right = newRight)
}

/**
 * `dot_long(x: ARRAY<BIGINT>, y: ARRAY<BIGINT>) -> BIGINT` — integer dot
 * product, the scoring kernel of the int8-quantized ANN path
 * ([[graft.operators.Similarity]] `ann_int8_topk`). Integer addition is
 * associative, so unlike the floating kernels there is no accumulation-
 * order contract to pin — any engine summing the same products gets the
 * same Long (the reason the quantized path is oracle-exact with a plain
 * SQL sum). Null semantics match [[ArrayDotDouble]]: null array ⇒ null,
 * null element ⇒ null, checks emitted only for containsNull inputs.
 */
final case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ArrayElementNullPropagation {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"dot_long: length mismatch ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (elemIsNull(x, y, i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot_long: length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemNullGuard(x, y, i, ev)}
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${guardedAssign(ev, s)}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

/**
 * `dot_tiny(x: ARRAY<TINYINT>, y: ARRAY<TINYINT>) -> BIGINT` — integer
 * dot product over int8 codes, the kernel of the verify-fetch int8
 * bound-prefilter ([[graft.operators.Similarity]]'s shuffle-hash face):
 * the candidate exchange carries 1 B/dim codes instead of 4 B/dim
 * floats, and this dot feeds the lossless cosine upper bound that
 * screens candidates before the raw-float fetch. Same associative-sum /
 * null-semantics contract as [[ArrayDotLong]]; products fit a Long for
 * any array shorter than 2⁴⁸ elements (|x·y| ≤ 127² per term).
 */
final case class ArrayDotTiny(left: Expression, right: Expression)
    extends BinaryExpression with ArrayElementNullPropagation {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<TINYINT>, ARRAY<TINYINT>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_tiny"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"dot_tiny: length mismatch ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (elemIsNull(x, y, i)) return null
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot_tiny: length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${elemNullGuard(x, y, i, ev)}
         |  $s += (long) $x.getByte($i) * (long) $y.getByte($i);
         |}
         |${guardedAssign(ev, s)}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotTiny =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Shim

  /** Column API for the native expression. */
  def cosineSimilarity(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(Shim.expression(a), Shim.expression(b)))

  /** Column API for the native SRP projection. */
  def dotDouble(x: Column, w: Column): Column =
    Shim.column(ArrayDotDouble(Shim.expression(x), Shim.expression(w)))

  /** Column API for the native integer dot product. */
  def dotLong(x: Column, y: Column): Column =
    Shim.column(ArrayDotLong(Shim.expression(x), Shim.expression(y)))

  /** Column API for the native int8-code dot product. */
  def dotTiny(x: Column, y: Column): Column =
    Shim.column(ArrayDotTiny(Shim.expression(x), Shim.expression(y)))

  /** Column API for the native per-element md5. */
  def arrayMd5(arr: Column, prefix: Column): Column =
    Shim.column(ArrayMd5(Shim.expression(arr), Shim.expression(prefix)))

  /** Column API for the native 64-bit SimHash. */
  def simhash64(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens)))

  /** Column API for the native fixed-point SRP band codes. */
  def srpBandCodes(embedding: Column, rowsPerBand: Int, nBands: Int): Column =
    Shim.column(SrpBandCodes(Shim.expression(embedding), rowsPerBand, nBands))

  /** Column API for the native coarse-quantizer assignment kernel. */
  def nearestCentroid(cents: Column, vec: Column, nrm: Column): Column =
    Shim.column(NearestCentroid(
      Shim.expression(cents), Shim.expression(vec), Shim.expression(nrm)))

  /** Column API for the native PQ sub-quantizer assignment kernel. */
  def nearestCode(cbs: Column, sub: Column): Column =
    Shim.column(NearestCode(Shim.expression(cbs), Shim.expression(sub)))
}
