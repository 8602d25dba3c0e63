package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Schema evolution on the file log — the operational reality of any
  * long-lived ingest directory: later batches grow columns. Readers must
  * (a) union the schemas when asked (`mergeSchema`), null-filling the
  * old files, and (b) keep working against the ORIGINAL schema without
  * it — an old consumer must not break because the producer evolved. */
class SchemaEvolutionSuite extends SparkSuite {

  test("mergeSchema unions evolved parquet batches; old readers keep working") {
    import scala.jdk.CollectionConverters._
    val sparkS = spark
    import sparkS.implicits._
    val out = java.nio.file.Files.createTempDirectory("evolve")
    try {
      // batch 1: v1 schema
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "key", "value")
        .write.parquet(s"$out/b1")
      // batch 2: v2 adds a column
      Seq((3L, "c", 3.0, "eu-1"), (4L, "d", 4.0, "us-2"))
        .toDF("id", "key", "value", "region")
        .write.parquet(s"$out/b2")

      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$out/b1", s"$out/b2")
      assert(merged.columns.sorted.toSeq === Seq("id", "key", "region", "value"))
      assert(merged.count() === 4)
      // old rows carry NULL in the new column; new rows keep their value
      assert(merged.filter(col("id") <= 2 && col("region").isNull).count() === 2)
      assert(merged.filter(col("id") >= 3 && col("region").isNotNull).count() === 2)

      // an old consumer pinning the v1 schema reads BOTH batches
      val v1 = spark.read.schema("id BIGINT, key STRING, value DOUBLE")
        .parquet(s"$out/b1", s"$out/b2")
      assert(v1.columns.sorted.toSeq === Seq("id", "key", "value"))
      assert(v1.agg(sum("value")).collect()(0).getDouble(0) === 10.0)
    } finally {
      java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
