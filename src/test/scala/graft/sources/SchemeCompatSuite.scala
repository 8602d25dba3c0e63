package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * P1 compat shim (reference AbstractScheme.java:38-65 +
 * AbstractSchemeTest): a legacy Storm-Kafka-style Scheme drops into the
 * engine unchanged, with the null ⇒ drop + auto-ack contract, and its
 * decode matches the migrated Catalyst (RawExprs) formulation row for
 * row.
 */
class SchemeCompatSuite extends SparkSuite {

  /** The kind of class a migrating user already has: a CSV splitter
    * that rejects malformed payloads by returning null. */
  private class CsvScheme extends AbstractScheme {
    def outputFields: Seq[String] = Seq("tenant", "body")
    def deserialize(value: Array[Byte]): Seq[String] = {
      if (value == null) return null
      val s = new String(value, java.nio.charset.StandardCharsets.UTF_8)
      val i = s.indexOf(',')
      if (i < 0) null else Seq(s.substring(0, i), s.substring(i + 1))
    }
  }

  test("legacy Scheme decodes, drops null-decodes, and matches its RawExprs migration") {
    val sparkS = spark
    import sparkS.implicits._
    val log = Seq(
      (0, 0L, "k0", "acme,hello"),
      (0, 1L, "k1", "no-comma-at-all"), // undecodable => dropped + acked
      (1, 0L, "k2", "globex,stuff,with,commas"),
      (1, 1L, "k3", null: String) // null payload => dropped
    ).toDF("partition", "offset", "key", "value")

    val viaScheme = new CsvScheme()(log)
      .select("partition", "offset", "tenant", "body")
      .orderBy("partition", "offset")
      .collect().toSeq

    assert(viaScheme.map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3))) ===
      Seq((0, 0L, "acme", "hello"), (1, 0L, "globex", "stuff,with,commas")))

    // the migrated form: same decode as codegen'd Catalyst expressions
    val migrated = DeserializerSpec.RawExprs(
      exprs = Seq(
        "tenant" -> "CASE WHEN instr(value, ',') > 0 THEN substring(value, 1, instr(value, ',') - 1) END",
        "body" -> "CASE WHEN instr(value, ',') > 0 THEN substring(value, instr(value, ',') + 1) END"),
      requireNonNull = Seq("tenant", "body"))
    val viaSpec = migrated(log)
      .select("partition", "offset", "tenant", "body")
      .orderBy("partition", "offset")
      .collect().toSeq
    assert(viaSpec === viaScheme)
  }

  test("binary payloads reach the Scheme verbatim through applyBinary") {
    val sparkS = spark
    import sparkS.implicits._
    // bytes that do NOT survive a String round-trip: 0xFF is not valid
    // UTF-8, so the string-typed `value` path would corrupt it — this is
    // the Avro/protobuf case the reference's ByteBuffer contract exists
    // for. The Scheme decodes [tag-byte, payload...] → (hex tag, length).
    val raw = Array[Byte](0xFF.toByte, 0x00, 0x7F, 0x80.toByte)
    val scheme = new AbstractScheme {
      def outputFields: Seq[String] = Seq("tag", "len")
      def deserialize(value: Array[Byte]): Seq[String] =
        if (value == null || value.isEmpty) null
        else Seq(f"${value(0) & 0xff}%02x", value.length.toString)
    }
    val log = Seq((0, 0L, "k0", raw), (0, 1L, "k1", Array.empty[Byte]))
      .toDF("partition", "offset", "key", "raw")
    val out = scheme.applyBinary(log, col("raw"))
      .select("offset", "tag", "len").orderBy("offset").collect().toSeq
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2))) ===
      Seq((0L, "ff", "4"))) // empty payload dropped; 0xFF preserved
  }

  test("a Scheme emitting the wrong arity fails loudly, not silently misaligned") {
    val sparkS = spark
    import sparkS.implicits._
    val bad = new AbstractScheme {
      def outputFields: Seq[String] = Seq("a", "b")
      def deserialize(value: Array[Byte]): Seq[String] = Seq("only-one")
    }
    val e = intercept[Exception] {
      bad(Seq((0, 0L, "k", "v")).toDF("partition", "offset", "key", "value"))
        .collect()
    }
    assert(e.getMessage != null)
  }
}
