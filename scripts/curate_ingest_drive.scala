// Streaming-curation ingest drive via the PACKAGED jar: the LLM-pipeline
// counterpart of scripts/sideline_drive.scala — REAL fixture documents
// arriving as a file stream are gated, redacted, and deduplicated
// against the persisted catalogs per micro-batch through the library
// surface (graft.operators.TrainingPipeline.curateIngest), with the
// epoch loop closed (admitted rows become history for later batches),
// and the final admitted set checked for PARITY against a batch
// backfill built from the SAME stage functions.
//
// Run:
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --jars target/scala-2.13/stormdynamicspoutspark_2.13-0.1.0.jar \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.shuffle.partitions=4 --conf spark.ui.enabled=false \
//     -I scripts/curate_ingest_drive.scala
// Grep output with: grep -oE 'CURATE_DRIVE .*'

object CurateIngestDrive {
  import graft.operators.{IncrementalDedup, Redaction, TrainingPipeline}
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import java.nio.file.Files

  def run(spark: SparkSession): Int = {
    val sparkS = spark
    import sparkS.implicits._

    var failures = 0
    def tag(m: String): Unit = println(s"CURATE_DRIVE $m")
    def check(c: Boolean, what: String): Unit =
      if (c) tag(s"PASS $what") else { failures += 1; tag(s"FAIL $what") }

    val fixture = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft-curate-drive").toString
    val inDir = s"$base/in"
    val (fpTable, bandTable) = ("graft_drive_fp", "graft_drive_band")
    spark.sql(s"DROP TABLE IF EXISTS $fpTable")
    spark.sql(s"DROP TABLE IF EXISTS $bandTable")

    val docs = spark.read.parquet(s"$fixture/documents.parquet")
      .select("doc_id", "text")

    // bootstrap history: 5 real docs; catalogs + doc store must exist
    // before the first batch (the curateIngest contract)
    val history = docs.filter(col("doc_id") >= 90 && col("doc_id") < 95)
    IncrementalDedup.writeCatalog(history, s"$base/fp", fpTable)
    IncrementalDedup.writeBandCatalog(history, s"$base/band", bandTable)
    history.write.parquet(s"$base/store")

    // batch 1: 20 fresh real docs + ONE history repeat under a new id
    val histText = history.orderBy("doc_id").limit(1)
      .select("text").head().getString(0)
    val batch1 = docs.filter(col("doc_id") < 20)
      .unionByName(Seq((1001L, histText)).toDF("doc_id", "text"))
    batch1.write.parquet(s"$inDir/b1")

    val admitted = scala.collection.mutable.ListBuffer.empty[Long]
    val q = TrainingPipeline.curateIngest(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(s"$inDir/b*"),
        fpTable, s"$base/fp", bandTable, s"$base/band", s"$base/store") { adm =>
        admitted.synchronized { admitted ++= adm.select("doc_id").as[Long].collect() }
        ()
      }.start()
    try {
      q.processAllAvailable()
      val a1 = admitted.synchronized(admitted.toSet)
      check(a1.nonEmpty, s"batch 1 admitted ${a1.size} real documents")
      check(!a1.contains(1001L), "history repeat (new id, known text) rejected in batch 1")

      // batch 2: repeat an ADMITTED batch-1 text under a fresh id (the
      // epoch loop must reject it), one NEAR-dup of an admitted text
      // (band catalog must reject it), and 10 fresh docs. Guard the min:
      // an empty admission set must FAIL-report, not crash the drive
      // before the RESULT line prints.
      val fresh1 = a1.filter(_ < 20)
      check(fresh1.nonEmpty, "batch 1 admitted at least one fixture doc")
      val repeatId = if (fresh1.nonEmpty) fresh1.min else -1L
      val repeatText = docs.filter(col("doc_id") === repeatId)
        .select("text").collect().headOption.map(_.getString(0)).getOrElse("absent")
      val nearText = repeatText.split(" ").init.mkString(" ") + " zzzz"
      val batch2 = docs.filter(col("doc_id") >= 20 && col("doc_id") < 30)
        .unionByName(Seq((2001L, repeatText), (2002L, nearText)).toDF("doc_id", "text"))
      batch2.write.parquet(s"$inDir/b2")
      q.processAllAvailable()
      val a2 = admitted.synchronized(admitted.toSet) -- a1
      check(!a2.contains(2001L), "exact repeat of a batch-1 admission rejected (epoch loop)")
      check(!a2.contains(2002L), "near-dup of a batch-1 admission rejected (band catalog)")
      check(a2.exists(_ < 30), s"fresh batch-2 documents admitted (${a2.size})")

      // PARITY: a batch backfill of the same EXACT-dup-only input (the
      // near-dup is a streaming-window case — within one batch plan the
      // fuzzy stage checks the CATALOG, not siblings) through the same
      // stage functions over the BOOTSTRAP catalogs admits the same set
      val backfillIn = batch1.unionByName(
        docs.filter(col("doc_id") >= 20 && col("doc_id") < 30))
        .unionByName(Seq((2001L, repeatText)).toDF("doc_id", "text"))
      spark.sql(s"DROP TABLE IF EXISTS $fpTable")
      spark.sql(s"DROP TABLE IF EXISTS $bandTable")
      IncrementalDedup.writeCatalog(history, s"$base/fp2", fpTable)
      IncrementalDedup.writeBandCatalog(history, s"$base/band2", bandTable)
      val redacted = backfillIn.withColumn("text", Redaction.redactColumn(col("text")))
      val gated = TrainingPipeline.qualityGate(redacted,
        graft.operators.CurationConfig())
      val keepers = TrainingPipeline.dedupKeepers(gated)
      val fresh = IncrementalDedup.dedupAgainstCatalog(keepers, fpTable)
      val batchAdmitted = IncrementalDedup
        .dedupFuzzyAgainstCatalog(fresh, bandTable, history)
        .select("doc_id").as[Long].collect().toSet
      val streamSet = (a1 ++ a2) - 2002L // drop the streaming-only near-dup case
      check(batchAdmitted == streamSet,
        s"batch backfill ≡ streaming ingest (${batchAdmitted.size} vs ${streamSet.size})")
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $fpTable")
      spark.sql(s"DROP TABLE IF EXISTS $bandTable")
    }
    tag(if (failures == 0) "RESULT ALL-PASS" else s"RESULT $failures FAILURES")
    failures
  }
}

val rc = CurateIngestDrive.run(spark)
System.exit(if (rc == 0) 0 else 1)
