package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark plan plus (when expressible)
  * the ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Column names MUST match between the two — the driver sorts
  * columns by name before hashing. Every query imposes a deterministic
  * total order so row-order-sensitive comparison also matches. */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** The DuckDB-side view of the synthesized event log — MUST stay in
    * lockstep with graft.sources.ParquetEventLog (partition = user_id % 4,
    * offset = dense per-partition row_number by event_id). */
  val logCte: String =
    """WITH log AS (
      |  SELECT event_id, user_id, event_type, value AS event_value, props,
      |         CAST(user_id AS VARCHAR) AS key,
      |         CAST(user_id % 4 AS INT) AS log_partition,
      |         CAST(row_number() OVER (PARTITION BY user_id % 4 ORDER BY event_id) - 1 AS BIGINT) AS log_offset
      |  FROM events
      |)""".stripMargin
}
