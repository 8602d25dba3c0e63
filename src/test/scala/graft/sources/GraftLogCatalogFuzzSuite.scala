package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.connector.catalog.Identifier

import java.nio.file.Files

/**
 * Seeded state-machine fuzz of the SQL catalog: random op sequences
 * (create/insert/truncate/drop/rename, table and namespace sides)
 * applied to BOTH the live catalog and a driver-side model of the
 * directory semantics. The model encodes the documented classification
 * — a dir with partition data is a LOG, one with other children is a
 * NAMESPACE, an empty dir is AMBIGUOUS (both until content
 * disambiguates) — and decides for every op whether it must succeed or
 * fail; any divergence (op outcome, exists/list answers, log contents)
 * fails the seed with the op trace. This is the adversarial pin on the
 * r15 guard set: no random interleaving may ever delete a confirmed
 * namespace through the table path, alias a namespace as a log, or
 * lose/duplicate rows across rename/truncate chains.
 */
class GraftLogCatalogFuzzSuite extends SparkSuite {

  // one catalog per seed: a fresh root guarantees no state leaks
  // between runs (a leftover log named like a namespace would desync
  // the next seed's empty model)
  private var catName: String = _
  private def registerCatalog(seed: Long): Unit = {
    catName = s"fz$seed"
    spark.conf.set(s"spark.sql.catalog.$catName", classOf[GraftLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root",
      Files.createTempDirectory(s"graftlog-fuzz-$seed").toString)
  }
  private def cat = spark.sessionState.catalogManager.catalog(catName)
    .asInstanceOf[GraftLogCatalog]

  // ---- driver-side model -------------------------------------------
  // paths are "/"-joined, depth <= 2; root "" is implicit
  private final class Model {
    val dirs = scala.collection.mutable.Set.empty[String]
    val rows = scala.collection.mutable.Map.empty[String, Long] // next offset, partition 0

    def children(p: String): Seq[String] =
      dirs.filter(d => parentOf(d) == p).toSeq.sorted
    private def parentOf(d: String): String = {
      val i = d.lastIndexOf('/')
      if (i < 0) "" else d.substring(0, i)
    }
    sealed trait Kind
    case object Log extends Kind
    case object Ns extends Kind
    case object Ambiguous extends Kind
    def kind(p: String): Kind =
      if (rows.getOrElse(p, 0L) > 0) Log
      else if (children(p).nonEmpty) Ns
      else Ambiguous
    def tableExists(p: String): Boolean = dirs(p) && kind(p) != Ns
    def nsExists(p: String): Boolean = p.isEmpty || (dirs(p) && kind(p) != Log)
    def addWithParents(p: String): Unit = {
      dirs += p
      val i = p.lastIndexOf('/')
      if (i > 0) dirs += p.substring(0, i)
    }
    def removeTree(p: String): Unit = {
      dirs.filter(d => d == p || d.startsWith(p + "/")).toSeq.foreach { d =>
        dirs -= d; rows -= d
      }
    }
  }

  private def ident(p: String): Identifier = {
    val parts = p.split('/')
    Identifier.of(parts.init, parts.last)
  }
  private def sqlName(p: String): String = s"$catName." + p.replace('/', '.')

  private def attempt[A](f: => A): Either[Throwable, A] =
    try Right(f) catch { case e: Throwable => Left(e) }

  /** One fuzz run: `ops` random operations under `seed`. */
  private def fuzz(seed: Long, ops: Int): Unit = {
    registerCatalog(seed)
    val rnd = new scala.util.Random(seed)
    val m = new Model
    val namespaces = Seq("na", "nb")
    val tables = Seq("t1", "t2", "t3")
    val space: Seq[String] =
      namespaces ++ tables ++ (for (n <- namespaces; t <- tables) yield s"$n/$t")
    def pick(): String = space(rnd.nextInt(space.length))
    val trace = scala.collection.mutable.ListBuffer.empty[String]

    def checkConsistency(at: String): Unit = {
      for (p <- space) {
        assert(cat.tableExists(ident(p)) === m.tableExists(p),
          s"[seed $seed] tableExists($p) diverged $at\n${trace.mkString("\n")}")
        assert(cat.namespaceExists(p.split('/')) === m.nsExists(p),
          s"[seed $seed] namespaceExists($p) diverged $at\n${trace.mkString("\n")}")
      }
      // a random log's contents: count and dense max offset
      val logs = space.filter(p => m.dirs(p) && m.rows.getOrElse(p, 0L) > 0)
      if (logs.nonEmpty) {
        val p = logs(rnd.nextInt(logs.length))
        val n = m.rows(p)
        val df = spark.table(sqlName(p))
        assert(df.count() === n,
          s"[seed $seed] $p row count diverged $at\n${trace.mkString("\n")}")
        assert(df.agg(org.apache.spark.sql.functions.max("offset")).head().getLong(0) === n - 1,
          s"[seed $seed] $p offsets not dense $at\n${trace.mkString("\n")}")
      }
      // listTables per namespace matches the model's classification
      for (ns <- Seq(Array.empty[String], Array("na"), Array("nb"))) {
        val nsPath = ns.mkString("/")
        if (m.nsExists(nsPath)) {
          val got = attempt(cat.listTables(ns).map(_.name()).toSet)
          val want = m.children(nsPath)
            .filter(c => m.kind(c) != m.Ns).map(_.split('/').last).toSet
          assert(got === Right(want),
            s"[seed $seed] listTables(${nsPath}) diverged $at: $got vs $want\n${trace.mkString("\n")}")
        }
      }
    }

    for (i <- 0 until ops) {
      val op = rnd.nextInt(100)
      if (op < 18) { // CREATE TABLE
        val p = pick()
        trace += s"$i: createTable $p"
        val r = attempt(cat.createTable(ident(p),
          new org.apache.spark.sql.types.StructType(),
          Array.empty[org.apache.spark.sql.connector.expressions.Transform],
          java.util.Collections.emptyMap[String, String]()))
        // parent must not be a confirmed LOG (nesting would corrupt it)
        val parentOk = !p.contains('/') || {
          val par = p.substring(0, p.indexOf('/'))
          !m.dirs(par) || m.kind(par) != m.Log
        }
        val expectOk = !m.tableExists(p) && !m.dirs(p) && parentOk
        assert(r.isRight === expectOk,
          s"[seed $seed] createTable $p: got $r, expected ok=$expectOk\n${trace.mkString("\n")}")
        if (expectOk) m.addWithParents(p)
      } else if (op < 30) { // CREATE NAMESPACE (single level only)
        val p = namespaces(rnd.nextInt(namespaces.length))
        trace += s"$i: createNamespace $p"
        val r = attempt(cat.createNamespace(Array(p),
          java.util.Collections.emptyMap[String, String]()))
        // AlreadyExists when nsExists (Ns or Ambiguous); occupies when Log
        val expect = !m.dirs(p)
        assert(r.isRight === expect,
          s"[seed $seed] createNamespace $p: got $r, expected ok=$expect\n${trace.mkString("\n")}")
        if (expect) m.dirs += p
      } else if (op < 50) { // INSERT
        val p = pick()
        val k = 1 + rnd.nextInt(4)
        trace += s"$i: insert $p x$k"
        val next = m.rows.getOrElse(p, 0L)
        val r = attempt(spark.sql(
          s"""INSERT INTO ${sqlName(p)}
             |SELECT cast(0 as int), $next + id, cast(id as string),
             |       concat('v', id) FROM range($k)""".stripMargin))
        val expectOk = m.dirs(p) && m.kind(p) != m.Ns
        assert(r.isRight === expectOk,
          s"[seed $seed] insert $p: got $r, expected ok=$expectOk\n${trace.mkString("\n")}")
        if (expectOk) m.rows(p) = next + k
      } else if (op < 58) { // TRUNCATE
        val p = pick()
        trace += s"$i: truncate $p"
        val r = attempt(spark.sql(s"TRUNCATE TABLE ${sqlName(p)}"))
        val expectOk = m.dirs(p) && m.kind(p) != m.Ns
        assert(r.isRight === expectOk,
          s"[seed $seed] truncate $p: got $r, expected ok=$expectOk\n${trace.mkString("\n")}")
        if (expectOk) m.rows -= p
      } else if (op < 72) { // DROP TABLE (direct API: no loadTable shield)
        val p = pick()
        trace += s"$i: dropTable $p"
        val r = attempt(cat.dropTable(ident(p)))
        assert(r.isRight, s"[seed $seed] dropTable $p threw: $r\n${trace.mkString("\n")}")
        val expect = m.tableExists(p)
        assert(r === Right(expect),
          s"[seed $seed] dropTable $p: got $r, expected $expect\n${trace.mkString("\n")}")
        if (expect) m.removeTree(p)
        else assert(m.children(p).forall(c => cat.tableExists(ident(c)) == m.tableExists(c)),
          s"[seed $seed] dropTable $p (refused) touched children\n${trace.mkString("\n")}")
      } else if (op < 80) { // DROP NAMESPACE
        val p = namespaces(rnd.nextInt(namespaces.length))
        val cascade = rnd.nextBoolean()
        trace += s"$i: dropNamespace $p cascade=$cascade"
        val r = attempt(cat.dropNamespace(Array(p), cascade))
        if (!m.nsExists(p)) {
          assert(r === Right(false),
            s"[seed $seed] dropNamespace $p: got $r, expected false\n${trace.mkString("\n")}")
        } else if (m.children(p).nonEmpty && !cascade) {
          assert(r.isLeft,
            s"[seed $seed] dropNamespace $p: non-empty without cascade must throw\n${trace.mkString("\n")}")
        } else {
          assert(r === Right(true),
            s"[seed $seed] dropNamespace $p: got $r, expected true\n${trace.mkString("\n")}")
          m.removeTree(p)
        }
      } else { // RENAME TABLE
        val (a, b) = (pick(), pick())
        trace += s"$i: rename $a -> $b"
        val r = attempt(cat.renameTable(ident(a), ident(b)))
        val targetParentOk = !b.contains('/') || {
          val par = b.substring(0, b.indexOf('/'))
          !m.dirs(par) || m.kind(par) != m.Log
        }
        val expectOk = a != b && !b.startsWith(a + "/") && m.tableExists(a) &&
          !m.tableExists(b) && !m.dirs(b) && targetParentOk
        assert(r.isRight === expectOk,
          s"[seed $seed] rename $a -> $b: got $r, expected ok=$expectOk\n${trace.mkString("\n")}")
        if (expectOk) {
          val moved = m.rows.get(a)
          m.removeTree(a)
          m.addWithParents(b)
          moved.foreach(n => m.rows(b) = n)
        }
      }
      if (i % 10 == 9) checkConsistency(s"after op $i")
    }
    checkConsistency("at end")
  }

  test("seeded random op sequences agree with the classification model") {
    for (seed <- Seq(11L, 23L, 47L, 101L, 211L)) fuzz(seed, 70)
  }
}
