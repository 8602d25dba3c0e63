package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class MultimodalSuite extends SparkSuite {

  test("binary pipeline: schema, batching, deterministic stub decode") {
    val bin = Multimodal.toBinary(Tables.documents(spark, sfDir))
    // payload is a real BINARY column with a typed metadata struct
    assert(bin.schema("payload").dataType.typeName === "binary")
    assert(bin.schema("meta").dataType.typeName === "struct")

    val feats = Multimodal.extractFeatures(spark, bin)
    val rows = feats.collect()
    assert(rows.length === bin.count())
    // deterministic: same input => same features on re-run
    val again = Multimodal.extractFeatures(spark, bin).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
    // stub decode arithmetic holds and md5 matches Spark's own md5()
    val one = rows.minBy(_.doc_id)
    assert(one.width === 64 + one.n_bytes % 577)
    assert(one.height === 64 + (one.n_bytes * 31) % 353)
    val sparkMd5 = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === one.doc_id)
      .select(md5(col("text"))).head().getString(0)
    assert(one.payload_md5 === sparkMd5)
  }

  test("decoder batch shape: batches of <= BatchSize, order preserved") {
    val docs = (0L until 150L).map(i =>
      Multimodal.BinaryDoc(i, s"payload-$i".getBytes("UTF-8"), "en", "src"))
    val out = docs.grouped(Multimodal.StubDecoder.BatchSize)
      .flatMap(Multimodal.StubDecoder.decode).toSeq
    assert(out.map(_.doc_id) === (0L until 150L))
  }
}
