package graft.operators

import graft.Tables
import graft.queries.QueryDef
import org.apache.spark.sql.functions._

/**
 * Sampling operators for training-data pipelines — the data-mixing face
 * of the LLM-pipeline family (brief §extensions): a mixture recipe
 * ("k documents per language/source/quality bucket") needs per-stratum
 * samples that are DETERMINISTIC (reproducible runs, auditable mixes)
 * and scale-safe (no per-stratum corpus funnel).
 */
object Sampling {

  private val K = 20

  /**
   * Deterministic stratified sample: the K lowest-hash documents per
   * language. Priority = the first 13 hex digits of
   * md5(doc_id-as-string) — 52 bits, so its numeric value is EXACT in a
   * double, and lexicographic hex order equals numeric order, letting
   * the DuckDB twin order by the substring directly while the Spark
   * side aggregates on the converted number. Hash-ordering is the
   * standard reproducible-sample trick: stable under corpus appends
   * (a new doc displaces at most one sampled doc per stratum), unlike
   * `TABLESAMPLE`/`rand()` which reshuffle everything every run.
   *
   * Scale shape: per-stratum top-k runs through the bounded
   * [[graft.functions.TopKAggregator]] — a map-side partial aggregation
   * shuffling AT MOST k rows per (map partition, stratum). The window
   * alternative (`row_number().over(partitionBy(lang))`, the oracle's
   * formulation) funnels every row of a stratum into one reducer task —
   * with a handful of languages over 100 TB that is a handful of tasks
   * sorting the corpus. Strata stay the GROUP key, not the partition
   * count, so low-cardinality strata cost nothing extra.
   */
  private val sampleStratified = QueryDef(
    (s, dir) => {
      import s.implicits._
      import graft.functions.{Scored, TopKAggregator}
      val topk = new TopKAggregator(K).toColumn.name("topk")
      Tables.documents(s, dir).repartition(64)
        .select(col("lang"), col("doc_id"),
          // negate: the aggregator keeps score DESC, we want LOWEST hash
          (lit(0.0) - expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as double)"))
            .as("prio"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, id, p) => Scored(id, p) }
        .agg(topk)
        .flatMap { case (lang, items) =>
          items.zipWithIndex.map { case (r, i) => (lang, i + 1, r.id) }
        }
        .toDF("lang", "rank", "doc_id")
        .orderBy("lang", "rank")
    },
    Some(s"""WITH ranked AS (
      |  SELECT lang, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY lang
      |           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), doc_id) AS rn
      |  FROM documents)
      |SELECT lang, CAST(rn AS INT) AS rank, doc_id
      |FROM ranked WHERE rn <= $K ORDER BY lang, rank""".stripMargin))

  val all: Map[String, QueryDef] = Map(
    "sample_stratified" -> sampleStratified)
}
