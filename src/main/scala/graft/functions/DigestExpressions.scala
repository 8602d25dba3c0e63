package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `array_md5(arr, prefix)` ≡ `transform(arr, x -> md5(concat(prefix, x)))`
 * — the per-shingle MinHash digest, as ONE native expression.
 *
 * Why it exists (r7 profile): the HOF form evaluates `Md5` through
 * interpreted lambda dispatch, and every interpreted `md5()` call does a
 * fresh `MessageDigest.getInstance` — a JCA provider lookup that
 * serializes 32 executor threads on the provider map. At sf0.1 the
 * shingle digests alone cost 3.6 s of `dedup_ngram_jaccard`'s 5.8 s;
 * this expression computes the identical bytes in a tight loop with a
 * thread-local digest (hex output byte-for-byte equal, so every
 * md5-pinned DuckDB oracle is untouched — DigestExpressionsSuite asserts
 * bit-equality against the HOF form).
 *
 * Null semantics: null array ⇒ null and null ELEMENT ⇒ null output
 * element (both as the HOF form); a null PREFIX ⇒ null result
 * (BinaryExpression default), where the concat-HOF would instead yield
 * an array of nulls — internal callers always pass literal prefixes,
 * SQL users should not pass a null one.
 */
final case class ArrayMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<STRING>, STRING), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType =
    ArrayType(StringType, left.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "array_md5"

  override protected def nullSafeEval(arr: Any, prefix: Any): Any =
    GraftDigests.md5HexArray(
      arr.asInstanceOf[ArrayData], prefix.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, prefix) =>
      s"${ev.value} = graft.functions.GraftDigests.md5HexArray($arr, $prefix);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayMd5 =
    copy(left = newLeft, right = newRight)
}

/**
 * `simhash64(tokens: ARRAY<STRING>) -> BIGINT` — the 64-bit SimHash
 * signature as ONE per-row expression: for every token occurrence
 * (duplicates count), bit b of md5(token)'s first 16 hex digits
 * contributes ±1 to counter b; signature bit b is set iff counter b ≥ 0.
 *
 * Bit order parity (pinned by DigestExpressionsSuite against the
 * explode+groupBy form and thus the DuckDB oracle): bit b reads hex
 * digit b/4 of the md5 hex string, bit position 3 − b%4 within the
 * digit — exactly `shiftright(instr('0123456789abcdef',
 * substring(md5(tok), b/4+1, 1)) − 1, 3 − b%4) % 2`.
 *
 * Why: the previous batch plan exploded every token (corpus-token-count
 * rows) through a 64-column map-side-combined groupBy — a full shuffle
 * of (doc_id, 64 ints) and 64 aggregate expressions per token row. This
 * expression computes the identical signature with ZERO shuffle, inside
 * whole-stage codegen, one md5 per token. Null array ⇒ null; null
 * ELEMENTS are skipped — split() never yields them, but note the
 * explode+groupBy form counts a null token as −1 in every counter, so
 * the bit-identity contract holds for null-free arrays only (all
 * internal callers; SQL users passing hand-built arrays with nulls get
 * the skip semantics).
 */
final case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(arr: Any): Any =
    GraftDigests.simhash64(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.GraftDigests.simhash64($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * `srp_band_codes(embedding: ARRAY<FLOAT>, rowsPerBand, nBands) ->
 * ARRAY<BIGINT>` — LSH band codes for the banded near-dup contract, as
 * one per-row kernel.
 *
 * The sketch is FIXED-POINT SRP: components quantize to
 * `floor(x · 2^20)` (exact in both engines — float→double is exact and
 * 2^20 is a power of two), hyperplane signs derive from
 * md5("srp:p:d") exactly like [[graft.operators.Similarity]]'s
 * 16-plane signature, and each projection is an ORDER-FREE integer sum
 * — so the DuckDB twin reproduces every band code bit-for-bit with a
 * plain SUM/GROUP BY, with no float-accumulation-order coupling between
 * engines (the constraint that capped the float-SRP dedup banding at 16
 * spelled-out plane expressions, and with it pair recall at ~0.62).
 * Band b's code is `b·2^r + bits(planes r·b .. r·b+r−1)` — band spaces
 * disjoint by construction. Null embedding ⇒ null.
 */
final case class SrpBandCodes(child: Expression, rowsPerBand: Int, nBands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(rowsPerBand >= 1 && rowsPerBand <= 62 && nBands >= 1 &&
    nBands.toLong <= (Long.MaxValue >> rowsPerBand),
    s"bad srp params: rowsPerBand=$rowsPerBand nBands=$nBands " +
      "(band codes b*2^rowsPerBand + code must not overflow Long)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT>, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "srp_band_codes"

  override protected def nullSafeEval(arr: Any): Any =
    GraftDigests.srpBandCodes(arr.asInstanceOf[ArrayData], rowsPerBand, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.GraftDigests.srpBandCodes($arr, $rowsPerBand, $nBands);")

  override protected def withNewChildInternal(newChild: Expression): SrpBandCodes =
    copy(child = newChild)
}

/** Static (codegen-callable) digest kernels. */
object GraftDigests {

  /** ±1 hyperplane signs, flat row-major (p·dim + d), cached per
    * (planes, dim): sign = +1 iff the first hex digit of md5("srp:p:d")
    * is < '8' — the identical derivation as Similarity.planeSign and the
    * DuckDB twins' `substr(md5(...), 1, 1) BETWEEN '0' AND '7'`. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  private[functions] def planeSigns(nPlanes: Int, dim: Int): Array[Byte] =
    planeCache.computeIfAbsent((nPlanes, dim), { case (np, dm) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Byte](np * dm)
      var p = 0
      while (p < np) {
        var d = 0
        while (d < dm) {
          md.reset()
          val dig = md.digest(s"srp:$p:$d".getBytes("UTF-8"))
          out(p * dm + d) = if (((dig(0) >> 4) & 0xf) < 8) 1 else -1
          d += 1
        }
        p += 1
      }
      out
    })

  /** Fixed-point SRP band codes; see [[SrpBandCodes]]. */
  def srpBandCodes(arr: ArrayData, rowsPerBand: Int, nBands: Int): ArrayData = {
    val dim = arr.numElements()
    val nPlanes = rowsPerBand * nBands
    val signs = planeSigns(nPlanes, dim)
    val q = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      q(d) = math.floor(arr.getFloat(d).toDouble * 1048576.0).toLong
      d += 1
    }
    val codes = new Array[Long](nBands)
    var b = 0
    var p = 0
    while (b < nBands) {
      var code = 0L
      var j = 0
      while (j < rowsPerBand) {
        val off = p * dim
        var s = 0L
        var i = 0
        while (i < dim) { s += signs(off + i) * q(i); i += 1 }
        if (s >= 0) code |= 1L << j
        p += 1; j += 1
      }
      codes(b) = b.toLong * (1L << rowsPerBand) + code
      b += 1
    }
    new GenericArrayData(codes)
  }
  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes

  /** md5 hex of a string on the THREAD-LOCAL digest + hex table — the
    * per-row keying shape for hot paths (a fresh
    * `MessageDigest.getInstance` + per-byte formatter would pay a JCA
    * lookup and 16 Formatter allocations per row). Byte-for-byte equal
    * to Spark's `md5()` hex output. */
  def md5Hex(s: String): String = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out, "US-ASCII")
  }

  /** 64-bit SimHash over token occurrences; see [[SimHash64]]. */
  def simhash64(arr: ArrayData): Long = {
    val md = tlMd5.get()
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        // bit b ← hex digit b/4 (nibble n: even = high nibble of byte
        // n/2), bit 3 − b%4 within the digit — matches the SQL forms
        var b = 0
        while (b < 64) {
          val nib = b >> 2
          val byteV = d(nib >> 1) & 0xff
          val v = if ((nib & 1) == 0) byteV >> 4 else byteV & 0xf
          if (((v >> (3 - (b & 3))) & 1) == 1) counters(b) += 1
          else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) sig += 1L << b
      b += 1
    }
    sig
  }

  /** md5 lowercase hex of (prefix ++ element) for every array element —
    * UTF-8 concatenation is byte concatenation, so this is exactly
    * `md5(concat(prefix, x))`. */
  def md5HexArray(arr: ArrayData, prefix: UTF8String): ArrayData = {
    val md = tlMd5.get()
    val pre = if (prefix.numBytes == 0) null else prefix.getBytes
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        if (pre != null) md.update(pre)
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        val hex = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = Hex((d(j) >> 4) & 0xf)
          hex(2 * j + 1) = Hex(d(j) & 0xf)
          j += 1
        }
        out(i) = UTF8String.fromBytes(hex)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
