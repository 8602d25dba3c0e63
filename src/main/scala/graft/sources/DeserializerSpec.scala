package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Serializable deserializer specs — the P1 Deserializer plug point
 * (kafka/deserializer/Deserializer.java:36-50: `deserialize(topic,
 * partition, offset, key, value): Values`, pluggable via config;
 * shipped impl Utf8StringDeserializer.java:35-50) as a small ADT that
 * compiles to Catalyst columns, mirroring [[graft.filter.FilterSpec]].
 *
 * Load-bearing reference semantics: a deserializer returning null DROPS
 * the message and auto-acks it (kafka/Consumer.java:351-360 — offsets
 * advance past undecodable rows instead of wedging the stream). Here
 * that is `ok`: rows where the decode verdict is false or NULL are
 * filtered out, and Structured Streaming's batch commit advances their
 * offsets exactly like the reference's commit+skip.
 *
 * Spark-first: decode stays inside whole-stage codegen (cast /
 * from_json / arbitrary SQL exprs), pushes column pruning into the
 * scan, and remains JSON-serializable so a config-driven deployment
 * (GraftConfig, reference FactoryManager) can swap decoders without
 * code.
 */
sealed trait DeserializerSpec extends Serializable {

  /** Decoded columns to add: (name, decode expression over the raw log
    * frame — `key`/`value` plus whatever the source carries). */
  def outputs: Seq[(String, Column)]

  /** TRUE when the decode succeeded. False or NULL ⇒ drop + auto-ack
    * (reference Consumer.java:351-360). */
  def ok: Column

  def toJson: String =
    JsonMethods.compact(JsonMethods.render(DeserializerSpec.toJValue(this)))

  /** Project the decoded columns and drop undecodable rows. */
  final def apply(df: DataFrame): DataFrame = {
    val withCols = outputs.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    withCols.filter(coalesce(ok, lit(false)))
  }
}

object DeserializerSpec {

  /** UTF-8 key/value decode — reference Utf8StringDeserializer.java:35-50
    * (emits [key, value] strings; bytes that aren't valid UTF-8 decode
    * with replacement, never null, so nothing drops). */
  case object Utf8 extends DeserializerSpec {
    def outputs: Seq[(String, Column)] = Seq(
      "key_str" -> col("key").cast("string"),
      "value_str" -> col("value").cast("string"))
    def ok: Column = lit(true)
  }

  /** Structured JSON decode: `from_json(field, schema)` into one struct
    * column; unparsable payloads drop. `schemaDdl` is a Spark DDL string
    * ("k INT, name STRING"). Spark's PERMISSIVE mode yields an all-null
    * struct (not a NULL) for malformed input, so corruption is detected
    * via an internal corrupt-record field that is stripped from the
    * decoded output. */
  final case class FromJson(field: String, schemaDdl: String,
      as: String = "decoded") extends DeserializerSpec {
    private val CorruptCol = "__graft_corrupt"
    private def decoded: Column =
      from_json(col(field), s"$schemaDdl, `$CorruptCol` STRING",
        Map("columnNameOfCorruptRecord" -> CorruptCol))
    def outputs: Seq[(String, Column)] =
      Seq(as -> decoded.dropFields(CorruptCol))
    def ok: Column = decoded.isNotNull && decoded.getField(CorruptCol).isNull
  }

  /** Escape hatch: named SQL decode expressions (the reference's
    * arbitrary-JVM-code deserializer, constrained to Catalyst so it still
    * codegens). Rows where any `requireNonNull` output is NULL drop. */
  final case class RawExprs(exprs: Seq[(String, String)],
      requireNonNull: Seq[String]) extends DeserializerSpec {
    require(requireNonNull.forall(n => exprs.exists(_._1 == n)),
      "requireNonNull names must be declared outputs")
    def outputs: Seq[(String, Column)] =
      exprs.map { case (n, sql) => n -> expr(sql) }
    def ok: Column =
      requireNonNull.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true))
  }

  private[sources] def toJValue(spec: DeserializerSpec): JValue = spec match {
    case Utf8 => JObject("op" -> JString("utf8"))
    case FromJson(f, ddl, as) => JObject(
      "op" -> JString("from_json"), "field" -> JString(f),
      "schema" -> JString(ddl), "as" -> JString(as))
    case RawExprs(exprs, req) => JObject(
      "op" -> JString("raw"),
      "exprs" -> JArray(exprs.map { case (n, e) =>
        JObject("name" -> JString(n), "expr" -> JString(e)) }.toList),
      "require_non_null" -> JArray(req.map(JString(_)).toList))
  }

  def fromJson(json: String): DeserializerSpec = {
    val o = JsonMethods.parse(json)
    def str(k: String): String = (o \ k) match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"bad $k: $other")
    }
    str("op") match {
      case "utf8" => Utf8
      case "from_json" => FromJson(str("field"), str("schema"), str("as"))
      case "raw" =>
        val exprs = (o \ "exprs") match {
          case JArray(xs) => xs.map { x =>
            (x \ "name", x \ "expr") match {
              case (JString(n), JString(e)) => n -> e
              case other => throw new IllegalArgumentException(s"bad expr: $other")
            }
          }
          case other => throw new IllegalArgumentException(s"bad exprs: $other")
        }
        val req = (o \ "require_non_null") match {
          case JArray(xs) => xs.collect { case JString(s) => s }
          case _ => Nil
        }
        RawExprs(exprs, req)
      case other => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }
}
