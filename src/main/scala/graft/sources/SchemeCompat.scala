package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Storm-Kafka `Scheme` compatibility layer — the migration bridge the
 * reference ships as kafka/deserializer/compat/AbstractScheme.java:38-65:
 * legacy deserializers implement two methods (output field names + a
 * byte-buffer decode returning the tuple values, null ⇒ drop) and plug
 * into the engine unchanged.
 *
 * Same contract here: implement [[outputFields]] and [[deserialize]],
 * and [[apply]] adapts the decode onto a log frame with the engine's P1
 * semantics — a null return DROPS the row and lets the batch commit
 * auto-ack it (reference Consumer.java:351-360), exactly like
 * [[DeserializerSpec]]'s `ok = false`.
 *
 * DELIBERATE exception to the no-UDF rule: a legacy Scheme is black-box
 * JVM code — the reference cannot see inside it either. The decode runs
 * as a scalar UDF (serialized to executors, no driver loop), which
 * breaks whole-stage codegen for this one projection; that is the cost
 * of running unmigrated code, not of the engine. The migration path OFF
 * this bridge is [[DeserializerSpec.RawExprs]]/[[DeserializerSpec.FromJson]],
 * which express the same decode as codegen'd Catalyst columns.
 */
abstract class AbstractScheme extends Serializable {

  /** Field names the decode emits — reference getOutputFields(). */
  def outputFields: Seq[String]

  /** Decode one raw payload into [[outputFields]].size values; return
    * null to drop the record (reference deserialize(ByteBuffer)). */
  def deserialize(value: Array[Byte]): Seq[String]

  /** Adapt onto a LogSchema frame: decode `value`, drop null-decodes,
    * project the output fields alongside the log columns.
    *
    * TEXT PAYLOADS ONLY: LogSchema's `value` column is a String, so the
    * bytes handed to [[deserialize]] are a UTF-8 RE-ENCODING of that
    * string — arbitrary binary (Avro/protobuf, the reference ByteBuffer
    * contract's main use case) does not round-trip through a String and
    * would reach the Scheme corrupted. Schemes that decode binary
    * payloads must use [[applyBinary]] on a source that preserves the
    * original record bytes in a BinaryType column. */
  final def apply(df: DataFrame): DataFrame =
    applyBinary(df, col("value").cast("binary"))

  /** Binary-payload path: `rawValue` must be a BinaryType column carrying
    * the ORIGINAL record bytes (e.g. a Kafka `value` read without the
    * string cast). This is the faithful port of the reference's
    * deserialize(ByteBuffer) contract — no string round-trip anywhere. */
  final def applyBinary(df: DataFrame, rawValue: Column): DataFrame = {
    val fields = outputFields
    require(fields.nonEmpty, "a Scheme must declare at least one output field")
    val decode = udf { (v: Array[Byte]) =>
      Option(deserialize(v)).map { vs =>
        require(vs.size == fields.size,
          s"scheme emitted ${vs.size} values for ${fields.size} fields")
        vs
      }
    }
    val dec = df.withColumn("__scheme", decode(rawValue))
      .filter(col("__scheme").isNotNull)
    fields.zipWithIndex.foldLeft(dec) { case (d, (n, i)) =>
      d.withColumn(n, col("__scheme").getItem(i))
    }.drop("__scheme")
  }
}
