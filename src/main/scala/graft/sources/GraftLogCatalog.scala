package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * SQL CATALOG face of the graftlog connector — logs addressable BY NAME
 * from pure SQL, no Scala required (the reference's config-first
 * ergonomics, SpoutConfig.java:70+ / README.md:130-160, at the SQL
 * layer):
 *
 * {{{
 *   SET spark.sql.catalog.graft=graft.sources.GraftLogCatalog
 *   SET spark.sql.catalog.graft.root=/data/logs
 *   CREATE TABLE graft.clicks
 *   INSERT INTO graft.clicks SELECT partition, offset, key, value ...
 *   SELECT * FROM graft.clicks WHERE offset >= 100   -- pushed range
 * }}}
 *
 * A table named `a.b.c` in catalog `graft` is the log directory
 * `<root>/a/b/c`; namespaces are plain subdirectories. Every loaded
 * table IS the native [[GraftLogTable]], so the whole pushdown surface
 * (partition pruning, offset ranges, footer-stat aggregates, limit),
 * the streaming source, and the exactly-once write path work unchanged
 * through SQL or `spark.table("graft.x")` — the catalog adds NAMING,
 * not a second code path.
 *
 * All schema is fixed ([[GraftLog.Schema]] — a log is positions + bytes,
 * the reference's message frame): CREATE TABLE accepts an empty or
 * exactly-matching column list and rejects anything else; ALTER is
 * unsupported by construction.
 */
class GraftLogCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"graftlog catalog '$name' needs spark.sql.catalog.$name.root=<logs dir>"))
  }

  override def name(): String = catalogName

  private def fs = new Path(root).getFileSystem(GraftLog.sessionConf())

  private def dirOf(ident: Identifier): Path =
    new Path((root +: ident.namespace().toSeq :+ ident.name()).mkString("/"))

  /** Directory classification. A directory with `partition=N` children
    * is DEFINITELY a log; one with other (non-underscore) children is
    * definitely a namespace; an EMPTY directory is structurally
    * ambiguous — a just-created log and a just-created namespace look
    * identical — so it counts as BOTH (listed by SHOW TABLES and SHOW
    * NAMESPACES alike) until content disambiguates it. Each side's
    * predicate therefore excludes only the CONFIRMED other kind. */
  private def hasPartitionDirs(p: Path): Boolean =
    fs.listStatus(p).exists(e =>
      e.isDirectory && e.getPath.getName.startsWith("partition="))

  /** Usable as a log: empty (underscore-internal entries — epoch/
    * producer/staging metadata — don't count), or carrying partition
    * dirs. */
  private def isLog(p: Path): Boolean = {
    val visible = fs.listStatus(p)
      .filterNot(_.getPath.getName.startsWith("_"))
    visible.isEmpty || visible.exists(e =>
      e.isDirectory && e.getPath.getName.startsWith("partition="))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((root +: namespace.toSeq).mkString("/"))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).toSeq
      .filter(e => e.isDirectory && !e.getPath.getName.startsWith("_"))
      .filter(e => isLog(e.getPath))
      .map(e => Identifier.of(namespace, e.getPath.getName))
      .toArray
  }

  /** Same classification as [[loadTable]]: a CONFIRMED namespace is not
    * a table, so exists/drop can never treat (or delete) one as a log. */
  override def tableExists(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    fs.exists(dir) && isLog(dir)
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    // a CONFIRMED namespace (non-empty, no partition dirs) is not a
    // table — reading it would silently return an empty log
    if (!fs.exists(dir) || !isLog(dir)) throw new NoSuchTableException(ident)
    new GraftLogTable(dir.toString)
  }

  /** No ancestor of a table/namespace path may be a CONFIRMED log:
    * mkdirs through one would nest foreign directories inside a log's
    * partition layout (and a later DROP of the log would silently
    * delete them). Missing ancestors are fine — they become namespaces
    * implicitly, the documented CREATE behavior. */
  private def requireAncestorsNotLogs(parts: Seq[String]): Unit = {
    parts.inits.toSeq.reverse.drop(1).dropRight(1).foreach { prefix =>
      val dir = new Path((root +: prefix).mkString("/"))
      if (fs.exists(dir) && hasPartitionDirs(dir))
        throw new IllegalArgumentException(
          s"${prefix.mkString(".")} is a graftlog table, not a namespace — " +
            s"cannot create ${parts.mkString(".")} inside it")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    requireAncestorsNotLogs(ident.namespace().toSeq :+ ident.name())
    // tableExists is false for a confirmed NAMESPACE at the path — but
    // creating a table over one would alias a namespace directory as a
    // log. Any existing non-log directory blocks creation.
    if (fs.exists(dirOf(ident)))
      throw new IllegalArgumentException(
        s"cannot create table ${ident}: a namespace already occupies " +
          s"${dirOf(ident)}")
    require(partitions.isEmpty,
      "graftlog tables are partitioned by the log's own partition column; " +
        "PARTITIONED BY is not accepted")
    if (schema.nonEmpty) {
      val want = GraftLog.Schema.fields.map(f => (f.name.toLowerCase, f.dataType))
      val got = schema.fields.map(f => (f.name.toLowerCase, f.dataType))
      require(got.sameElements(want),
        s"a graftlog table's schema is fixed to ${GraftLog.Schema.simpleString}; " +
          s"got ${schema.simpleString} (omit the column list)")
    }
    fs.mkdirs(dirOf(ident))
    new GraftLogTable(dirOf(ident).toString)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graftlog tables have a fixed schema; ALTER TABLE is not supported")

  /** Recursive delete only after the [[isLog]] check (via
    * [[tableExists]]): a direct API call with an identifier that is
    * actually a confirmed namespace must NOT delete the subtree of logs
    * under it — it reports "no such table" (false) instead. A FAILED
    * delete of a confirmed table is a different thing entirely:
    * returning false there surfaces as NoSuchTableException in Spark's
    * DropTableExec while the log (or part of it) survives on disk —
    * that must fail loudly, naming what survived, like truncateTable. */
  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && {
      val dir = dirOf(ident)
      val deleted = fs.delete(dir, true)
      if (!deleted && fs.exists(dir))
        throw new IllegalStateException(
          s"DROP TABLE $ident failed to delete $dir — the log still " +
            "exists on disk (undeletable entries?); refusing to report " +
            "it as dropped or missing")
      deleted || !fs.exists(dir)
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    // A confirmed namespace at the target passes the tableExists check
    // but fs.rename into an existing directory would NEST the log inside
    // it instead of replacing — any existing target path blocks rename.
    if (fs.exists(dirOf(newIdent)))
      throw new IllegalArgumentException(
        s"cannot rename to ${newIdent}: a namespace already occupies " +
          s"${dirOf(newIdent)}")
    requireAncestorsNotLogs(newIdent.namespace().toSeq :+ newIdent.name())
    // a target inside the source's own subtree would make fs.rename
    // move a directory into itself (raw IOException on local FS,
    // rename=false on HDFS) — reject it as the nonsense it is
    val oldParts = oldIdent.namespace().toSeq :+ oldIdent.name()
    val newParts = newIdent.namespace().toSeq :+ newIdent.name()
    if (newParts.startsWith(oldParts))
      throw new IllegalArgumentException(
        s"cannot rename ${oldIdent} into its own subtree ${newIdent}")
    fs.mkdirs(dirOf(newIdent).getParent)
    require(fs.rename(dirOf(oldIdent), dirOf(newIdent)),
      s"failed to rename log ${oldIdent} to ${newIdent}")
  }

  // ---- stored procedures (`CALL <cat>.system.<proc>(...)`) -------------

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftLogProcedures.Names
        .map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graftlog procedures live under the 'system' namespace " +
        s"(CALL $catalogName.system.<proc>), got ${ident}")
    GraftLogProcedures.load(ident.name(), { table =>
      val parts = table.split("\\.").toSeq
      require(parts.nonEmpty && parts.forall(_.nonEmpty),
        s"bad table name '$table'")
      val dir = dirOf(Identifier.of(parts.init.toArray, parts.last))
      require(fs.exists(dir), s"no such log: $table (at $dir)")
      dir.toString
    })
  }

  // ---- namespaces = plain subdirectories (SHOW/CREATE/DROP NAMESPACE) ---

  private def nsPath(ns: Array[String]): Path =
    new Path((root +: ns.toSeq).mkString("/"))

  /** Child directories that are not CONFIRMED logs (and not
    * underscore-internal) are namespaces — empty directories included
    * (see the classification note on [[hasPartitionDirs]]). */
  private def childNamespaces(ns: Array[String]): Seq[String] = {
    val dir = nsPath(ns)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(dir).toSeq
      .filter(e => e.isDirectory && !e.getPath.getName.startsWith("_"))
      .filterNot(e => hasPartitionDirs(e.getPath))
      .map(_.getPath.getName)
  }

  override def listNamespaces(): Array[Array[String]] =
    childNamespaces(Array.empty).map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    childNamespaces(namespace).map(n => namespace :+ n).toArray

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsPath(namespace)) && !hasPartitionDirs(nsPath(namespace)))

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.singletonMap(
      SupportsNamespaces.PROP_LOCATION, nsPath(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    // A confirmed LOG at the target path makes namespaceExists false, so
    // without this check the call would silently "succeed" (mkdirs
    // no-op) over what listTables reports as a table.
    if (fs.exists(nsPath(namespace)) && hasPartitionDirs(nsPath(namespace)))
      throw new IllegalArgumentException(
        s"cannot create namespace ${namespace.mkString(".")}: a graftlog " +
          s"table already occupies ${nsPath(namespace)}")
    requireAncestorsNotLogs(namespace.toSeq)
    fs.mkdirs(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graftlog namespaces are plain directories; ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    val dir = nsPath(namespace)
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new NonEmptyNamespaceException(namespace)
    fs.delete(dir, true)
  }
}
