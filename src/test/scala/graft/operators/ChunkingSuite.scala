package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Invariants of the fixed-window chunking op beyond the oracle row:
  * coverage (last chunk ends exactly at the doc end), internal
  * consistency (declared token counts match the emitted text), and the
  * zero-shuffle plan shape. */
class ChunkingSuite extends SparkSuite {

  private val W = 32
  private val S = 24

  test("chunks cover each doc exactly; counts match the emitted text") {
    val chunks = SparkEntry.queries("chunk_documents")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))

    // declared n_chunk_tokens == tokens actually in chunk_text
    val inconsistent = chunks.filter(
      size(split(col("chunk_text"), " ")) =!= col("n_chunk_tokens")).count()
    assert(inconsistent === 0L)

    // last chunk ends at the doc's last token; chunk count is the formula
    val per = chunks.groupBy("doc_id").agg(
      max(col("chunk_id") * S + col("n_chunk_tokens")).as("covered"),
      count(lit(1)).as("nc"))
      .join(docs, "doc_id")
    assert(per.filter(col("covered") =!= col("n")).count() === 0L)
    val badCount = per.filter(col("nc") =!=
      when(col("n") <= W, 1L)
        .otherwise(lit(1L) + floor((col("n") - W + (S - 1)) / S))).count()
    assert(badCount === 0L)
    // every doc chunked, none dropped
    assert(per.count() === docs.count())
  }

  test("chunk 0 is a prefix of the doc; overlap region agrees across neighbors") {
    val chunks = SparkEntry.queries("chunk_documents")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val first = chunks.filter(col("chunk_id") === 0).join(docs, "doc_id")
    assert(first.filter(!col("text").startsWith(col("chunk_text"))).count() === 0L)

    // neighbor overlap: last W−S tokens of chunk i == first W−S of chunk i+1
    // (whenever chunk i+1 has at least W−S tokens)
    val a = chunks.select(col("doc_id"), col("chunk_id"),
      split(col("chunk_text"), " ").as("t1"))
    val b = chunks.select(col("doc_id"), (col("chunk_id") - 1).as("chunk_id"),
      split(col("chunk_text"), " ").as("t2"), col("n_chunk_tokens").as("len2"))
    val olap = W - S
    val mism = a.join(b, Seq("doc_id", "chunk_id"))
      .filter(col("len2") >= olap)
      .filter(slice(col("t1"), S + 1, olap) =!= slice(col("t2"), 1, olap))
      .count()
    assert(mism === 0L)
  }

  test("the plan is narrow: no exchange beyond the parallelizing repartition") {
    val df = SparkEntry.queries("chunk_documents")(spark, sfDir)
    df.collect()
    // orderBy adds a range exchange for output presentation; the WORK
    // (split/explode/slice) must sit on the single repartition only
    val exchanges = flattenPlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[Exchange])
    assert(exchanges <= 2,
      df.queryExecution.executedPlan.toString.take(2000))
  }
}
