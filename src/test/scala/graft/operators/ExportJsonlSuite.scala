package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The hand-built JSONL lines must be REAL JSON: every line parses with a
  * standard JSON reader and round-trips the source fields bit-for-bit —
  * including documents containing the two escaped characters, which the
  * driver fixture never exercises. */
class ExportJsonlSuite extends SparkSuite {

  private val lineSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("text", StringType)))

  test("every exported line parses as JSON and round-trips the source row") {
    val out = SparkEntry.queries("export_jsonl")(spark, sfDir)
      .withColumn("parsed", from_json(col("line"), lineSchema))
    // PERMISSIVE from_json yields a Row of null FIELDS on malformed input
    // (never a null struct) — assert on a field that is never null in the
    // source, or the check is vacuous
    assert(out.filter(col("parsed.text").isNull).count() == 0)
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val mismatched = out.select(col("parsed.doc_id").as("doc_id"),
        col("parsed.lang").as("lang"), col("parsed.source").as("source"),
        col("parsed.text").as("text"))
      .exceptAll(src)
    assert(mismatched.isEmpty, mismatched.take(3).mkString(", "))
    val shards = out.select("shard").distinct().collect().map(_.getInt(0))
    assert(shards.forall(s => s >= 0 && s < 16) && shards.length > 1)
  }

  test("backslashes, quotes, control chars, and NULL fields stay valid JSON") {
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("jsonl-esc").toString
    Seq(
      (1L, "a \\ b", "en", "web", 10L),
      (2L, "say \"hi\" \\\\ done", "en", "web", 12L),
      (3L, "line1\nline2\ttabbed\rcr", "en", "web", 20L),
      (4L, "bell\u0007gone \u0001\u001fstripped", "en", "web", 20L),
      (5L, "nulls next door", null, null, 15L),
      // multi-byte content must pass through untouched (JSON does not
      // require escaping non-ASCII; char-based fns must not split bytes)
      (6L, "café 日本語 😀 naïve", "ja", "web", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("export_jsonl")(spark, tmp)
      .withColumn("parsed", from_json(col("line"), lineSchema))
    // text is non-null in every fixture row; a malformed line nulls it
    assert(out.filter(col("parsed.text").isNull).count() == 0, "a line failed to parse")
    val back = out.select(col("parsed.doc_id"), col("parsed.text"), col("parsed.lang"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
    assert(back(1L) == (("a \\ b", Some("en"))))
    assert(back(2L) == (("say \"hi\" \\\\ done", Some("en"))))
    // \n \t \r round-trip as real characters
    assert(back(3L) == (("line1\nline2\ttabbed\rcr", Some("en"))))
    // other C0 controls are STRIPPED (un-representable without \u escapes)
    assert(back(4L) == (("bellgone stripped", Some("en"))))
    // NULL string fields emit JSON null, not a broken literal
    assert(back(5L) == (("nulls next door", None)))
    // the raw line for the null-field doc says `"lang":null` explicitly
    val rawNull = out.filter(col("doc_id") === 5L).select("line").head().getString(0)
    assert(rawNull.contains("\"lang\":null"), rawNull)
    // unicode round-trips byte-for-byte
    assert(back(6L) == (("café 日本語 😀 naïve", Some("ja"))))
  }
}
