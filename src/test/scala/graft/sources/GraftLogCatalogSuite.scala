package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Local filesystem whose recursive delete FAILS (returns false,
  * deletes nothing) on any path containing "undeletable" — the
  * HDFS-undeletable-entry shape, injectable under a root that ignores
  * permission bits. */
class FlakyDeleteFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "flakydel"
  override def getUri: java.net.URI = java.net.URI.create("flakydel:///")
  override def delete(p: org.apache.hadoop.fs.Path, recursive: Boolean): Boolean =
    if (p.toString.contains("undeletable")) false else super.delete(p, recursive)
}

/** The SQL catalog face: logs addressable by name — CREATE / INSERT /
  * SELECT / SHOW / RENAME / DROP — resolving to the SAME native V2
  * table as `format("graftlog")`, pushdown surface included. */
class GraftLogCatalogSuite extends SparkSuite {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graftlog-cat").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftLogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", r)
    r
  }

  private def seedLog(name: String, n: Int, parts: Int): String = {
    val dir = s"$root/$name"
    GraftLog.materialize(
      spark.range(0, n.toLong)
        .selectExpr(s"cast(id % $parts as int) as partition",
          s"id div $parts as offset",
          "cast(id as string) as key", "concat('v', id) as value"),
      dir)
    dir
  }

  test("SQL round trip: CREATE, INSERT (dense offsets), SELECT with pushed bounds") {
    root // force catalog registration
    spark.sql("CREATE TABLE graft.clicks")
    // two partitions, offsets 0..4 each — INSERT rides the V2 write path
    spark.sql("""INSERT INTO graft.clicks
      SELECT cast(id % 2 as int), id div 2, cast(id as string), concat('v', id)
      FROM range(10)""")
    assert(spark.sql("SELECT count(*) FROM graft.clicks").head().getLong(0) === 10)

    // a second INSERT must continue each partition's dense sequence
    spark.sql("""INSERT INTO graft.clicks
      SELECT cast(id % 2 as int), 5 + id div 2, concat('k', id), concat('w', id)
      FROM range(4)""")
    val after = GraftLog.latestOffsets(s"$root/clicks",
      spark.sessionState.newHadoopConf())
    assert(after === Map(0 -> 7L, 1 -> 7L), after.toString)

    // offset bounds through SQL: the filter reaches the scan (pushed,
    // not residual) and the result window is exact
    val bounded = spark.sql(
      "SELECT key FROM graft.clicks WHERE offset >= 5 AND partition = 0")
    assert(bounded.collect().map(_.getString(0)).sorted === Array("k0", "k2"))
    val scanDesc = bounded.queryExecution.executedPlan.toString
    assert(scanDesc.contains("graftlog"), scanDesc)
  }

  test("catalog table content equals the format('graftlog') path") {
    root
    seedLog("parity", 40, 4)
    val viaCatalog = spark.table("graft.parity").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val viaFormat = spark.read.format("graftlog")
      .option("path", s"$root/parity").load().collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(viaCatalog === viaFormat)
    assert(viaCatalog.length === 40)
    // footer-stat aggregate pushdown works through the catalog name too
    assert(spark.sql("SELECT min(offset), max(offset) FROM graft.parity")
      .head().toSeq === Seq(0L, 9L))
  }

  test("SHOW TABLES, RENAME and DROP manage the log directories") {
    root
    seedLog("a_log", 4, 2)
    spark.sql("CREATE TABLE graft.b_log")
    val shown = spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).toSet
    assert(Set("a_log", "b_log").subsetOf(shown), shown.toString)

    // the RENAME target resolves inside the source's catalog — a
    // `graft.`-qualified target would be read as a NAMESPACE named graft
    spark.sql("ALTER TABLE graft.a_log RENAME TO c_log")
    assert(spark.table("graft.c_log").count() === 4)
    assert(!new java.io.File(s"$root/a_log").exists())

    spark.sql("DROP TABLE graft.b_log")
    assert(!new java.io.File(s"$root/b_log").exists())
    val e = intercept[Exception](spark.table("graft.does_not_exist").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.toString)
  }

  test("streaming reads and writes work against catalog names") {
    root
    seedLog("stream_src", 20, 2)
    val cp = Files.createTempDirectory("graftlog-cat-cp").toString
    spark.sql("CREATE TABLE graft.stream_dst")
    val q = spark.readStream.table("graft.stream_src")
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .toTable("graft.stream_dst")
    q.awaitTermination(60000)
    val copied = spark.table("graft.stream_dst").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(3))).sortBy(t => (t._1, t._2))
    assert(copied.length === 20, s"streamed copy has ${copied.length} rows")
    copied.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2).toSeq === (0L until rs.length.toLong), s"partition $p not dense")
    }
  }

  test("pushdown through the catalog path: partition pruning + offset windows at PLANNING") {
    root
    seedLog("pushdown", 40, 4) // 10 offsets per partition
    val df = spark.sql(
      "SELECT key FROM graft.pushdown WHERE partition = 2 AND offset >= 5")
    df.collect()
    val scan = flattenPlan(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no V2 batch scan through the catalog name"))
    val parts = scan.inputPartitions.collect { case g: GraftLogInputPartition => g }
    assert(parts.length === 1, s"partition predicate did not prune planning: ${parts.toSeq}")
    assert(parts.head.partition === 2 && parts.head.from === 5L && parts.head.until === 10L,
      s"offset range not planned: ${parts.head}")
    // footer-stat aggregate pushdown plans NO data task through SQL names
    val agg = spark.sql("SELECT count(*) FROM graft.pushdown")
    assert(agg.head().getLong(0) === 40L)
    val aggScan = flattenPlan(agg.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no V2 scan in the aggregate plan"))
    // a pushed aggregate plans ONE metadata partition carrying the
    // footer-stat answer — and no offset-window data task
    assert(!aggScan.inputPartitions.exists(_.isInstanceOf[GraftLogInputPartition]),
      s"count through the catalog planned data tasks: ${aggScan.inputPartitions.toSeq}")
    assert(aggScan.inputPartitions.exists(_.getClass.getSimpleName == "GraftLogAggResult"),
      "count was not answered from footer statistics")
  }

  test("namespaces: CREATE/SHOW/USE/DROP map to subdirectories; logs live inside them") {
    root
    spark.sql("CREATE NAMESPACE graft.team_a")
    // a just-created (still empty) namespace must ALREADY be visible —
    // the empty-directory ambiguity resolves as "both" until content
    // disambiguates (the r14 self-review defect)
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet.contains("team_a"))
    seedLog("team_a/events", 4, 2)
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
    assert(ns.contains("team_a"), ns.toString)
    val tables = spark.sql("SHOW TABLES IN graft.team_a").collect()
      .map(_.getString(1)).toSet
    assert(tables === Set("events"))
    assert(spark.table("graft.team_a.events").count() === 4)
    // non-empty namespace refuses a plain drop, cascades on request
    val e = intercept[Exception](spark.sql("DROP NAMESPACE graft.team_a"))
    assert(e.getMessage.toLowerCase.contains("empty"), e.toString)
    spark.sql("DROP NAMESPACE graft.team_a CASCADE")
    assert(!new java.io.File(s"$root/team_a").exists())
  }

  test("stored procedures: committed_offsets, compact_segments, recover via CALL") {
    root
    // a log grown by several appends: multiple segment files/partition
    spark.sql("CREATE TABLE graft.maint")
    for (w <- 0 until 3)
      spark.sql(s"""INSERT INTO graft.maint
        SELECT cast(id % 2 as int), ${w * 5} + id div 2, cast(id as string),
               concat('w$w-', id) FROM range(10)""")

    val offsets = spark.sql(
      "CALL graft.system.committed_offsets(`table` => 'maint')").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(offsets === Map(0 -> 15L, 1 -> 15L), offsets.toString)

    def segs(p: Int) = Option(new java.io.File(s"$root/maint/partition=$p")
      .listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    assert(segs(0) === 3 && segs(1) === 3)
    val before = spark.table("graft.maint").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(3))).sortBy(t => (t._1, t._2)).toSeq

    val merged = spark.sql(
      "CALL graft.system.compact_segments(`table` => 'maint')").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged === Map(0 -> 3, 1 -> 3), merged.toString)
    assert(segs(0) === 1 && segs(1) === 1, "segments not compacted to one")
    val after = spark.table("graft.maint").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(after === before, "compaction changed rows or offsets")

    assert(spark.sql("CALL graft.system.recover_compaction(`table` => 'maint')")
      .head().getString(0) === "ok")
    val e = intercept[Exception](
      spark.sql("CALL graft.system.committed_offsets(`table` => 'nope')").collect())
    assert(e.getMessage.contains("no such log"), e.toString)
  }

  test("store_stats and expire_epochs observe/maintain epoch stores from SQL") {
    root
    import org.apache.spark.sql.functions.lit
    val store = Files.createTempDirectory("graft-store-proc").toString
    val face = s"$store/edges"
    // two committed epochs + one torn (data, no marker)
    for (e <- Seq(1L, 2L)) {
      spark.range(4 * e).withColumn("epoch", lit(e))
        .write.mode("append").partitionBy("epoch").parquet(face)
      graft.ops.EpochCommit.mark(spark, face, e)
    }
    spark.range(2).withColumn("epoch", lit(3L))
      .write.mode("append").partitionBy("epoch").parquet(face)

    val stats = spark.sql(s"CALL graft.system.store_stats(path => '$store')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getInt(4), r.getLong(5)))
    assert(stats.map(t => (t._1, t._2, t._3, t._4)).toSeq ===
      Seq(("edges", 1L, true, false), ("edges", 2L, true, true),
        ("edges", 3L, false, false)), stats.mkString(", "))
    assert(stats.forall(t => t._5 > 0 && t._6 > 0L), "every epoch dir has files+bytes")

    // expiry drops only SUPERSEDED committed epochs; the torn dir stays
    // for the writer's sweep, the latest keeps serving
    val expired = spark.sql(s"CALL graft.system.expire_epochs(path => '$face')")
      .collect().map(_.getLong(0)).toSeq
    assert(expired === Seq(1L))
    val after = spark.sql(s"CALL graft.system.store_stats(path => '$store')")
      .collect().map(r => (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toSeq
    assert(after === Seq((2L, true, true), (3L, false, false)), after.mkString(", "))

    // sweep_torn reclaims the torn dir (and only it)
    val swept = spark.sql(s"CALL graft.system.sweep_torn(path => '$face')")
      .collect().map(_.getLong(0)).toSeq
    assert(swept === Seq(3L))
    val finalStats = spark.sql(s"CALL graft.system.store_stats(path => '$store')")
      .collect().map(r => (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toSeq
    assert(finalStats === Seq((2L, true, true)), finalStats.mkString(", "))

    // a path without an _epochs namespace is rejected loudly
    val e = intercept[Exception](
      spark.sql(s"CALL graft.system.expire_epochs(path => '$store')").collect())
    assert(e.getMessage.contains("_epochs"), e.toString)
    val e2 = intercept[Exception](
      spark.sql(s"CALL graft.system.sweep_torn(path => '$store')").collect())
    assert(e2.getMessage.contains("_epochs"), e2.toString)
  }

  test("TRUNCATE TABLE resets the log; the next append restarts at offset 0") {
    root
    seedLog("trunc", 20, 2)
    assert(spark.table("graft.trunc").count() === 20)
    spark.sql("TRUNCATE TABLE graft.trunc")
    assert(spark.table("graft.trunc").count() === 0)
    spark.sql("""INSERT INTO graft.trunc
      SELECT cast(id % 2 as int), id div 2, cast(id as string), concat('n', id)
      FROM range(4)""")
    val rows = spark.table("graft.trunc").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(rows === Seq((0, 0L), (0, 1L), (1, 0L), (1, 1L)),
      s"post-truncate offsets did not restart at 0: $rows")
  }

  test("table/namespace asymmetry: the table path never deletes or aliases a namespace") {
    // r14-advice defects: tableExists was true for ANY directory and
    // dropTable deleted whatever it was given, so DROP TABLE on a
    // confirmed namespace recursively deleted every log under it;
    // createNamespace over a confirmed log silently "succeeded".
    root
    spark.sql("CREATE NAMESPACE graft.guard_ns")
    seedLog("guard_ns/inner", 4, 2) // confirms guard_ns as a namespace

    // DROP TABLE on the namespace: rejected through SQL resolution…
    val e = intercept[Exception](spark.sql("DROP TABLE graft.guard_ns"))
    assert(e.getMessage.toLowerCase.contains("table"), e.toString)
    // …and through the direct TableCatalog API (no loadTable shield)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftLogCatalog]
    val nsIdent = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "guard_ns")
    assert(!cat.tableExists(nsIdent), "a confirmed namespace is not a table")
    assert(!cat.dropTable(nsIdent), "dropTable must refuse a namespace")
    assert(new java.io.File(s"$root/guard_ns/inner").exists(),
      "the namespace's logs must survive every table-path drop attempt")

    // CREATE TABLE over the namespace path: rejected
    val e2 = intercept[Exception](spark.sql("CREATE TABLE graft.guard_ns"))
    assert(e2.getMessage.toLowerCase.contains("occupies"), e2.toString)

    // CREATE NAMESPACE over a confirmed log: rejected, not a silent no-op
    seedLog("guard_log", 4, 2)
    val e3 = intercept[Exception](spark.sql("CREATE NAMESPACE graft.guard_log"))
    assert(e3.getMessage.toLowerCase.contains("occupies"), e3.toString)

    // RENAME onto the namespace path: rejected (fs.rename would NEST the
    // log inside the existing directory, not replace it)
    seedLog("guard_src", 4, 2)
    val e4 = intercept[Exception](
      spark.sql("ALTER TABLE graft.guard_src RENAME TO guard_ns"))
    assert(e4.getMessage.toLowerCase.contains("occupies"), e4.toString)
    assert(new java.io.File(s"$root/guard_src").exists())
    assert(spark.table("graft.guard_ns.inner").count() === 4)
  }

  test("dropTable on a confirmed table whose delete FAILS throws loudly, never false") {
    // r15-verdict defect: `tableExists(ident) && fs.delete(dir, true)`
    // conflated a failed recursive delete with not-a-table — Spark's
    // DropTableExec surfaces the false as NoSuchTableException while
    // the log (or part of it) survives on disk. Same failure family as
    // the truncateTable fix: a survived delete must be LOUD. Root runs
    // ignore file permissions, so the failure is injected through a
    // filesystem scheme whose delete() returns false on marked paths.
    root
    spark.conf.set("fs.flakydel.impl", classOf[FlakyDeleteFileSystem].getName)
    spark.conf.set("fs.flakydel.impl.disable.cache", "true")
    val base = Files.createTempDirectory("graftlog-flaky").toString
    val cat = new GraftLogCatalog
    cat.initialize("flaky", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", s"flakydel:$base")))
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "undeletable_log")
    // an empty directory classifies as a (just-created) table
    assert(new java.io.File(s"$base/undeletable_log").mkdirs())
    assert(cat.tableExists(ident))
    val e = intercept[IllegalStateException](cat.dropTable(ident))
    assert(e.getMessage.contains("still exists"), e.toString)
    assert(new java.io.File(s"$base/undeletable_log").exists(),
      "the log must survive intact when the loud path fires")
    // a deletable sibling still drops cleanly through the same fs
    val ok = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "normal_log")
    assert(new java.io.File(s"$base/normal_log").mkdirs())
    assert(cat.dropTable(ok))
    assert(!new java.io.File(s"$base/normal_log").exists())
  }

  test("fixed schema: mismatched CREATE columns and ALTER are rejected") {
    root
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft.bad (wrong INT, shape STRING)"))
    assert(e.getMessage.contains("fixed"), e.toString)
    seedLog("immutable", 2, 1)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft.immutable ADD COLUMN extra INT"))
    assert(e2.getMessage.toLowerCase.contains("not supported"), e2.toString)
  }
}
