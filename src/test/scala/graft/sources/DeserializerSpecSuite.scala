package graft.sources

import graft.SparkSuite

/** P1 Deserializer plug-point coverage: JSON roundtrips, null⇒drop+ack
  * semantics (Consumer.java:351-360), and codegen-friendly decode. */
class DeserializerSpecSuite extends SparkSuite {

  private def raw = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      ("k1", """{"k": 1, "name": "a"}"""),
      ("k2", """{"name": "no-k"}"""),
      ("k3", "not json at all"),
      ("k4", """{"k": 4}""")).toDF("key", "value")
  }

  test("specs round-trip through JSON") {
    val specs: Seq[DeserializerSpec] = Seq(
      DeserializerSpec.Utf8,
      DeserializerSpec.FromJson("value", "k INT, name STRING"),
      DeserializerSpec.RawExprs(
        Seq("k" -> "cast(get_json_object(value, '$.k') as int)"),
        requireNonNull = Seq("k")))
    specs.foreach { s =>
      assert(DeserializerSpec.fromJson(s.toJson) === s)
    }
  }

  test("utf8 decode keeps every row (reference Utf8StringDeserializer)") {
    val out = DeserializerSpec.Utf8(raw)
    assert(out.count() === 4)
    assert(out.columns.contains("key_str") && out.columns.contains("value_str"))
  }

  test("from_json drops unparsable payloads (null => drop + ack)") {
    val out = DeserializerSpec.FromJson("value", "k INT, name STRING")(raw)
    // 'not json at all' decodes to NULL struct and is dropped; documents
    // missing `k` still decode (struct non-null) and survive
    val keys = out.select("key").collect().map(_.getString(0)).sorted
    assert(keys === Array("k1", "k2", "k4"))
  }

  test("raw exprs drop rows whose required outputs are null") {
    val spec = DeserializerSpec.RawExprs(
      Seq("k" -> "cast(get_json_object(value, '$.k') as int)"),
      requireNonNull = Seq("k"))
    val out = spec(raw)
    val keys = out.select("key").collect().map(_.getString(0)).sorted
    assert(keys === Array("k1", "k4"))
  }

  test("requireNonNull must name declared outputs") {
    intercept[IllegalArgumentException] {
      DeserializerSpec.RawExprs(Seq("a" -> "1"), requireNonNull = Seq("missing"))
    }
  }
}
