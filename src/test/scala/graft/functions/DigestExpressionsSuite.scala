package graft.functions

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Pins the bit-equality contracts of the digest kernels
  * (DigestExpressions.scala) against the HOF/explode forms the DuckDB
  * oracles spell out — the contract every md5-pinned oracle row rides on. */
class DigestExpressionsSuite extends SparkSuite {

  test("simhash64 matches the explode+groupBy signature exactly (the oracle's form)") {
    val docs = Tables.documents(spark, sfDir)
    val native = docs.select(col("doc_id"),
      VectorFunctions.simhash64(split(col("text"), " ")).as("s_native"))
    // the original 64-column aggregate shape (still what the DuckDB twin
    // spells out): explode every token occurrence, ±1 per md5 hex bit
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until 64).map { b =>
      val bit = expr(s"shiftright(instr('0123456789abcdef', substring(h, ${b / 4 + 1}, 1)) - 1, ${3 - b % 4}) % 2")
      sum(when(bit === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sig = (0 until 64).map(b => when(col(s"s$b") >= 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val hof = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("s_hof"))
    val mismatches = native.join(hof, "doc_id")
      .filter(col("s_native") =!= col("s_hof")).count()
    assert(mismatches === 0L)
    assert(native.count() === hof.count())
  }

  test("array_md5 matches transform+md5 byte-for-byte, prefix and nulls included") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Tables.documents(spark, sfDir).limit(300)
      .withColumn("sh", split(col("text"), " "))
    def same(prefix: String): Long = docs.select(
      (VectorFunctions.arrayMd5(col("sh"), lit(prefix)) =!=
        expr(s"transform(sh, x -> md5(concat('$prefix', x)))")).as("ne"))
      .filter(col("ne")).count()
    assert(same("") === 0L)
    assert(same("3:") === 0L)
    // null array ⇒ null; null ELEMENT ⇒ null element (the HOF truth table)
    val edge = Seq(
      (1L, Array[String]("a", null, "b")),
      (2L, null.asInstanceOf[Array[String]]),
      (3L, Array.empty[String])).toDF("id", "sh")
    val got = edge.select(col("id"),
      VectorFunctions.arrayMd5(col("sh"), lit("")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(got(2L) === null)
    assert(got(3L) === Seq.empty)
    assert(got(1L)(1) === null && got(1L)(0) != null && got(1L)(2) != null)
  }

  test("srp_band_codes: band spaces are disjoint and deterministic") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val rowsPerBand = 6
    val nBands = 24
    val codes = emb.select(explode(
      VectorFunctions.srpBandCodes(col("embedding"), rowsPerBand, nBands)).as("c"))
      .collect().map(_.getLong(0))
    assert(codes.length === 100 * nBands)
    // every code lands in its band's half-open slot [b·2^r, (b+1)·2^r)
    val perRow = codes.grouped(nBands)
    perRow.foreach { row =>
      row.zipWithIndex.foreach { case (c, b) =>
        val lo = b.toLong << rowsPerBand
        assert(c >= lo && c < lo + (1L << rowsPerBand), s"band $b code $c")
      }
    }
    // deterministic: a second evaluation produces identical codes
    val again = emb.select(explode(
      VectorFunctions.srpBandCodes(col("embedding"), rowsPerBand, nBands)).as("c"))
      .collect().map(_.getLong(0))
    assert(codes.toSeq === again.toSeq)
  }

  test("srp_band_codes rejects configs whose band codes would overflow Long") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val child = Literal.create(Array(1.0f), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false))
    // safe: largest band base nBands·2^rowsPerBand stays under 2^63
    SrpBandCodes(child, 6, 24)
    SrpBandCodes(child, 40, 1 << 20)
    // overflow: 2^40 bands × 2^40 codes ⇒ band bases wrap negative
    intercept[IllegalArgumentException](SrpBandCodes(child, 40, Int.MaxValue))
    intercept[IllegalArgumentException](SrpBandCodes(child, 62, 2))
    intercept[IllegalArgumentException](SrpBandCodes(child, 0, 4))
  }
}
