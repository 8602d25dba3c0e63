// PURE-SQL curation drive (r16): the full library-consumer story with
// every DATA operation a SQL statement — ingest into a graftlog table
// through the catalog, curate with the SQL-registered kernel functions,
// maintain with CALL procedures — no Scala DataFrame API anywhere in
// the pipeline (the host object only issues spark.sql and asserts).
//
// Run (packaged jar; the extensions + catalog are session-build confs,
// exactly what a consumer puts in spark-defaults):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf spark.sql.catalog.graft=graft.sources.GraftLogCatalog \
//     --conf spark.sql.catalog.graft.root=/tmp/sql_drive_logs \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     -I scripts/curate_sql_drive_r16.scala
object SqlCurateDrive {
  def sql(q: String) = spark.sql(q)
  def one(q: String): Long = sql(q).collect()(0).getLong(0)

  def run(): Unit = {
    val docs = "/root/testdata/sf0.001/documents.parquet"
    new java.io.File("/tmp/sql_drive_logs").mkdirs()
    sql("DROP TABLE IF EXISTS graft.raw_docs")
    sql("DROP TABLE IF EXISTS graft.curated")

    // ---- 1. INGEST: parquet corpus → graftlog table, all SQL ----
    sql(s"CREATE TEMPORARY VIEW corpus USING parquet OPTIONS (path '$docs')")
    sql("CREATE TABLE graft.raw_docs")
    sql("""INSERT INTO graft.raw_docs
      SELECT cast(doc_id % 4 AS int), doc_id div 4,
             cast(doc_id AS string), text
      FROM corpus""")
    // two PII-bearing rows (SQL VALUES ride the same V2 write path,
    // offsets continuing each partition's dense sequence) so the
    // redaction stage provably fires on this clean fixture corpus
    sql("""INSERT INTO graft.raw_docs VALUES
      (0, 125, 'pii-1', 'please contact alice@example.com about the corpus
drop and keep this sentence long enough to clear the twelve token gate'),
      (1, 125, 'pii-2', 'the on call pager is 01-555-123-4567 and the box
sits at 10.2.3.4 which is definitely enough tokens for the quality gate')""")
    val rawN = one("SELECT count(*) FROM graft.raw_docs")
    val srcN = one("SELECT count(*) FROM corpus")
    assert(rawN == srcN + 2, s"ingest lost rows: $rawN vs $srcN + 2")
    println(s"SQLDRIVE ingested $rawN rows into graft.raw_docs")

    // ---- 2. CURATE: kernel functions from pure SQL ----
    // redaction chain + quality gate + exact-dup removal, one statement
    sql("""CREATE TEMPORARY VIEW curated_rows AS
      WITH redacted AS (
        SELECT partition, offset, key,
               regexp_redact_chain(value).redacted AS value
        FROM graft.raw_docs),
      gated AS (
        SELECT *, size(split(value, ' ')) AS n_tokens
        FROM redacted
        WHERE length(value) >= 50 AND size(split(value, ' ')) >= 12),
      deduped AS (
        SELECT partition, offset, key, value,
               row_number() OVER (PARTITION BY md5(value)
                                  ORDER BY offset, partition) AS dup_rank
        FROM gated)
      SELECT partition, offset, key, value FROM deduped WHERE dup_rank = 1""")
    // near-dup candidate census through the native simhash64 expression
    val bandDups = one("""
      SELECT cast(count(*) AS bigint) FROM (
        SELECT shiftright(simhash64(split(lower(value), ' ')), 48) AS band,
               count(*) AS n
        FROM curated_rows GROUP BY 1 HAVING count(*) > 1)""")
    println(s"SQLDRIVE simhash band census: $bandDups collided bands")
    sql("CREATE TABLE graft.curated")
    sql("""INSERT INTO graft.curated
      SELECT cast(partition AS int),
             row_number() OVER (PARTITION BY partition ORDER BY offset) - 1,
             key, value
      FROM curated_rows""")
    val curN = one("SELECT count(*) FROM graft.curated")
    assert(curN > 0 && curN <= rawN, s"curation produced $curN of $rawN")
    val redactedN = one("""SELECT count(*) FROM graft.curated
      WHERE value LIKE '%[EMAIL]%' OR value LIKE '%[PHONE]%'
         OR value LIKE '%[IP]%' OR value LIKE '%[NUM]%'""")
    assert(redactedN >= 2, s"the injected PII rows were not redacted ($redactedN)")
    println(s"SQLDRIVE curated $curN rows ($redactedN carrying redactions)")

    // cosine_similarity: the SQL face of the vector kernel on the
    // embeddings table (top similar pair per label, pure SQL)
    sql("""CREATE TEMPORARY VIEW emb USING parquet
      OPTIONS (path '/root/testdata/sf0.001/embeddings.parquet')""")
    val sim = sql("""
      SELECT a.label, max(cosine_similarity(a.embedding, b.embedding)) AS s
      FROM emb a JOIN emb b
        ON a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY a.label ORDER BY a.label""").collect()
    assert(sim.nonEmpty && sim.forall(r => r.getDouble(1) <= 1.000001))
    println(s"SQLDRIVE cosine over ${sim.length} labels ok")

    // ---- 3. MAINTAIN: CALL procedures + TRUNCATE ----
    // positions are next-write positions: their sum IS the row count
    val off = sql("CALL graft.system.committed_offsets(`table` => 'curated')")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(off.values.sum == curN,
      s"committed offsets $off disagree with $curN rows")
    println(s"SQLDRIVE committed_offsets: $off")

    // grow segments with a second batch (offsets continue each
    // partition's dense sequence — the first batch's offsets were
    // row_number()-1, so its per-partition count IS the continuation
    // base; computed from the SOURCE view, never by reading the insert
    // target inside its own INSERT), then fold the segments via CALL
    sql("""INSERT INTO graft.curated
      SELECT cast(cr.partition AS int),
             row_number() OVER (PARTITION BY cr.partition ORDER BY cr.offset)
               - 1 + b.n,
             concat('b2-', cr.key), cr.value
      FROM curated_rows cr
      JOIN (SELECT partition, count(*) AS n FROM curated_rows GROUP BY partition) b
        ON b.partition = cr.partition""")
    val grownN = one("SELECT count(*) FROM graft.curated")
    assert(grownN == 2 * curN, s"second batch: $grownN vs ${2 * curN}")
    val folded = sql("CALL graft.system.compact_segments(`table` => 'curated')")
      .collect()
    println(s"SQLDRIVE compacted ${folded.length} partitions: " +
      folded.map(r => s"p${r.getInt(0)}<-${r.getInt(1)}").mkString(" "))
    assert(folded.nonEmpty, "nothing compacted after two insert batches")
    val afterN = one("SELECT count(*) FROM graft.curated")
    assert(afterN == grownN, s"compaction changed row count: $afterN vs $grownN")
    assert(sql("CALL graft.system.recover_compaction(`table` => 'curated')")
      .collect()(0).getString(0) == "ok", "recovery CALL did not return ok")

    // retire the raw staging log
    sql("TRUNCATE TABLE graft.raw_docs")
    assert(one("SELECT count(*) FROM graft.raw_docs") == 0)
    sql("DROP TABLE graft.raw_docs")
    println(s"SQLDRIVE maintenance done; curated table intact at $afterN rows")
    println("SQLDRIVE PASS")
  }
}
SqlCurateDrive.run()
System.exit(0)
