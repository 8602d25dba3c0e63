package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL stored procedures of the graftlog catalog (Spark 4's DSv2
 * `ProcedureCatalog`, the Iceberg `CALL cat.system.proc(...)`
 * convention) — the engine's MAINTENANCE and OBSERVABILITY faces
 * without Scala:
 *
 * {{{
 *   CALL graft.system.committed_offsets(`table` => 'clicks')
 *   CALL graft.system.compact_segments(`table` => 'clicks', min_files => 2)
 *   CALL graft.system.recover_compaction(`table` => 'clicks')
 * }}}
 *
 * `table` is the catalog-relative log name (`'ns.clicks'` for a log in
 * a namespace). `compact_segments`/`recover_compaction` carry the same
 * MAINTENANCE WINDOW contract as the library faces they call
 * ([[GraftLogMaintenance]]); `committed_offsets` answers from parquet
 * footer statistics only — the metadata-cost position lookup, now one
 * `CALL` away from any SQL client.
 */
private[sources] object GraftLogProcedures {

  val Names: Seq[String] =
    Seq("committed_offsets", "compact_segments", "recover_compaction")

  /** Rows returned driver-side: every procedure's output here is
    * metadata-sized (per-partition summaries), the `LocalScan` shape. */
  private final class ResultScan(
      schema: StructType, result: Array[InternalRow]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = result
  }

  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("catalog-relative log name, e.g. 'clicks' or 'ns.clicks'")
      .build()

  private abstract class Proc(
      procName: String, params: Array[ProcedureParameter])
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // reads/changes the log
  }

  /** `dirFor` maps the `table` argument to the log directory (catalog
    * root + relative path) — supplied by the owning catalog. */
  def load(procName: String, dirFor: String => String): UnboundProcedure = {
    def dirOf(input: InternalRow): String = {
      require(!input.isNullAt(0), "table must not be null")
      dirFor(input.getUTF8String(0).toString)
    }
    procName match {
      case "committed_offsets" =>
        new Proc("committed_offsets", Array(tableParam)) {
          override def description(): String =
            "per-partition next offsets from parquet footer statistics (no data scan)"
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val schema = new StructType()
              .add("partition", IntegerType).add("next_offset", LongType)
            val rows = GraftLog
              .latestOffsets(dirOf(input), spark.sessionState.newHadoopConf())
              .toSeq.sortBy(_._1)
              .map { case (p, o) =>
                new GenericInternalRow(Array[Any](p, o)): InternalRow }
            java.util.List.of[Scan](
              new ResultScan(schema, rows.toArray)).iterator()
          }
        }
      case "compact_segments" =>
        new Proc("compact_segments", Array(tableParam,
          ProcedureParameter.in("min_files", IntegerType).defaultValue("2")
            .comment("only partitions with at least this many segments compact")
            .build())) {
          override def description(): String =
            "merge a log partition's per-batch segment files into one " +
              "(journaled, offsets unchanged; maintenance window required)"
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val minFiles = if (input.isNullAt(1)) 2 else input.getInt(1)
            val merged = GraftLogMaintenance
              .compactSegments(spark, dirOf(input), minFiles)
            val schema = new StructType()
              .add("partition", IntegerType).add("merged_segments", IntegerType)
            val rows = merged.toSeq.sortBy(_._1).map { case (p, n) =>
              new GenericInternalRow(Array[Any](p, n)): InternalRow }
            java.util.List.of[Scan](
              new ResultScan(schema, rows.toArray)).iterator()
          }
        }
      case "recover_compaction" =>
        new Proc("recover_compaction", Array(tableParam)) {
          override def description(): String =
            "finish or abort a compaction a crash left in flight"
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            GraftLogMaintenance.recover(SparkSession.active, dirOf(input))
            val schema = new StructType().add("recovered", StringType)
            java.util.List.of[Scan](new ResultScan(schema, Array(
              new GenericInternalRow(Array[Any](UTF8String.fromString("ok")))
            ))).iterator()
          }
        }
      case other => throw new IllegalArgumentException(
        s"unknown graftlog procedure '$other' (have: ${Names.mkString(", ")})")
    }
  }
}
