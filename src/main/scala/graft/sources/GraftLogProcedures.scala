package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}
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
 *
 * The OPERATOR-STORE layer (every [[graft.ops.EpochCommit]]-governed
 * parquet store: IVF `assigned`/`codes`, the kNN graph's `edges`, the
 * incremental-dedup catalogs) gets its own observability/maintenance
 * pair, addressed by PATH (stores live outside the catalog's log root):
 *
 * {{{
 *   CALL graft.system.store_stats(path => '/indexes/knng')
 *   CALL graft.system.expire_epochs(path => '/indexes/knng/edges')
 * }}}
 */
private[sources] object GraftLogProcedures {

  val Names: Seq[String] =
    Seq("committed_offsets", "compact_segments", "recover_compaction",
      "store_stats", "expire_epochs", "sweep_torn")

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
    def pathOf(input: InternalRow): String = {
      require(!input.isNullAt(0), "path must not be null")
      input.getUTF8String(0).toString
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
      case "store_stats" =>
        new Proc("store_stats", Array(pathParam)) {
          override def description(): String =
            "per-epoch file counts/bytes of every EpochCommit-governed face " +
              "under a store path (committed, torn, and latest flags; metadata only)"
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val root = pathOf(input)
            val fs = new org.apache.hadoop.fs.Path(root)
              .getFileSystem(spark.sessionState.newHadoopConf())
            val schema = new StructType()
              .add("face", StringType).add("epoch", LongType)
              .add("committed", BooleanType).add("latest", BooleanType)
              .add("files", IntegerType).add("bytes", LongType)
            val rows = epochFaces(fs, root).sorted.flatMap { face =>
              val faceRoot = if (face.isEmpty) root else s"$root/$face"
              val committed = graft.ops.EpochCommit.committed(spark, faceRoot).toSet
              val live = if (committed.isEmpty) -1L else committed.max
              val epochDirs = fs.listStatus(new org.apache.hadoop.fs.Path(faceRoot))
                .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch="))
                .map(st => st.getPath.getName.stripPrefix("epoch=") -> st.getPath)
                .collect { case (n, p) if n.nonEmpty && n.forall(_.isDigit) => n.toLong -> p }
              // torn epochs have a data dir and no marker; a committed
              // epoch could briefly have a marker and no dir mid-expiry —
              // surface both sides of the union
              val all = (epochDirs.map(_._1).toSet ++ committed).toSeq.sorted
              val dirOfEpoch = epochDirs.toMap
              all.map { e =>
                val (files, bytes) = dirOfEpoch.get(e) match {
                  case Some(d) =>
                    var (nf, nb) = (0, 0L)
                    val it = fs.listFiles(d, true)
                    while (it.hasNext) { val f = it.next(); nf += 1; nb += f.getLen }
                    (nf, nb)
                  case None => (0, 0L)
                }
                new GenericInternalRow(Array[Any](UTF8String.fromString(face), e,
                  committed.contains(e), e == live, files, bytes)): InternalRow
              }
            }
            java.util.List.of[Scan](
              new ResultScan(schema, rows.toArray)).iterator()
          }
        }
      case "expire_epochs" =>
        new Proc("expire_epochs", Array(pathParam)) {
          override def description(): String =
            "drop SUPERSEDED epochs (all committed below the latest) of one " +
              "supersede-semantics epoch root, e.g. a kNN graph's edges face " +
              "(NEVER a union-semantics store - its history IS the data; " +
              "maintenance window required)"
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val root = pathOf(input)
            val fs = new org.apache.hadoop.fs.Path(root)
              .getFileSystem(spark.sessionState.newHadoopConf())
            require(fs.exists(new org.apache.hadoop.fs.Path(root, "_epochs")),
              s"$root is not an epoch-committed store root (no _epochs); " +
                "pass the face itself, e.g. '<store>/edges'")
            val expired = graft.ops.EpochCommit.latest(spark, root) match {
              case Some(live) => graft.ops.EpochCommit.expireBelow(spark, root, live)
              case None => Seq.empty[Long]
            }
            val schema = new StructType().add("expired_epoch", LongType)
            val rows = expired.map(e =>
              new GenericInternalRow(Array[Any](e)): InternalRow)
            java.util.List.of[Scan](
              new ResultScan(schema, rows.toArray)).iterator()
          }
        }
      case "sweep_torn" =>
        new Proc("sweep_torn", Array(pathParam)) {
          override def description(): String =
            "delete torn (data without marker) epoch dirs of one epoch root - " +
              "crash leftovers invisible to readers; safe under any semantics"
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val root = pathOf(input)
            val fs = new org.apache.hadoop.fs.Path(root)
              .getFileSystem(spark.sessionState.newHadoopConf())
            require(fs.exists(new org.apache.hadoop.fs.Path(root, "_epochs")),
              s"$root is not an epoch-committed store root (no _epochs); " +
                "pass the face itself, e.g. '<store>/edges'")
            val swept = graft.ops.EpochCommit.sweepTorn(spark, root)
            val schema = new StructType().add("swept_epoch", LongType)
            java.util.List.of[Scan](new ResultScan(schema,
              swept.map(e => new GenericInternalRow(Array[Any](e)): InternalRow)
                .toArray)).iterator()
          }
        }
      case other => throw new IllegalArgumentException(
        s"unknown graftlog procedure '$other' (have: ${Names.mkString(", ")})")
    }
  }

  private def pathParam: ProcedureParameter =
    ProcedureParameter.in("path", StringType)
      .comment("absolute store path (operator stores live outside the catalog root)")
      .build()

  /** Epoch-committed faces under `root`: relative paths of every
    * directory holding an `_epochs` marker namespace, the root itself
    * included (as `''`). Bounded walk — store layouts nest at most
    * `<store>/<face>` — and metadata-only. */
  private def epochFaces(fs: org.apache.hadoop.fs.FileSystem,
      root: String, maxDepth: Int = 3): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    require(fs.exists(rootPath), s"no such store path: $root")
    def walk(p: org.apache.hadoop.fs.Path, rel: String, depth: Int): Seq[String] = {
      val entries = fs.listStatus(p)
      val here =
        if (entries.exists(e => e.isDirectory && e.getPath.getName == "_epochs"))
          Seq(rel)
        else Seq.empty
      val below =
        if (depth >= maxDepth) Seq.empty
        else entries.toSeq
          .filter(e => e.isDirectory && !e.getPath.getName.startsWith("_") &&
            !e.getPath.getName.contains("="))
          .flatMap(e => walk(e.getPath,
            if (rel.isEmpty) e.getPath.getName else s"$rel/${e.getPath.getName}",
            depth + 1))
      here ++ below
    }
    walk(rootPath, "", 0)
  }
}
