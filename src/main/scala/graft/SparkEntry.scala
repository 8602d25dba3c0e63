package graft
import graft.operators.{Dedup, EntityResolution, Graph, ImportanceSelection, IncrementalDedup, IvfIndex, KnnGraphStore, LanguageModel, Layout, Multimodal, Profiling, Redaction, Sampling, Search, Similarity, TextAnalysis, Tokenizer, TrainingPipeline}
import graft.queries.{AnalyticsQueries, EventTimeQueries, ParityQueries, QueryDef, ScalarQueries, TpchExtraQueries}
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator claimed in SURVEY.md §2 has an entry in `queries`; the
  * SQL-expressible ones also appear in `oracleSql` (same column names —
  * the driver sorts columns by name before hashing). */
object SparkEntry {

  private def defs: Map[String, QueryDef] =
    ParityQueries.all ++ AnalyticsQueries.all ++ EventTimeQueries.all ++
      ScalarQueries.all ++ TpchExtraQueries.all ++
      TextAnalysis.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++
      Sampling.all ++ TrainingPipeline.all ++ IncrementalDedup.all ++
      IvfIndex.all ++ KnnGraphStore.all ++
      Profiling.all ++ LanguageModel.all ++ Redaction.all ++
      ImportanceSelection.all ++ Search.all ++ Graph.all ++ Layout.all ++
      Tokenizer.all ++ EntityResolution.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The sideline parity invariant — the reference's signature feature. */
  def entry(spark: SparkSession): DataFrame =
    defs("sideline_union_parity").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
