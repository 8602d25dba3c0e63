package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The native V2 micro-batch connector's contract: offsets ARE the
  * per-partition position map (the reference ConsumerState), admission
  * control splits a row budget over backlogs, restart resumes from the
  * committed positions, and out-of-range starts follow failOnDataLoss
  * (kafka/Consumer.java:548-590's recovery). */
class GraftLogProviderSuite extends SparkSuite {

  private def writeLog(n: Int, parts: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftlog").toString
    GraftLog.materialize(
      spark.range(0, n.toLong)
        .selectExpr(s"cast(id % $parts as int) as partition",
          s"id div $parts as offset",
          "cast(id as string) as key", "concat('v', id) as value"),
      dir)
    dir
  }

  test("batch read through the V2 provider equals the raw parquet content") {
    val dir = writeLog(200, 4)
    val got = spark.read.format("graftlog").option("path", dir).load()
      .orderBy("partition", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
    val want = spark.read.parquet(dir)
      .select(col("partition").cast("int"), col("offset"), col("key"), col("value"))
      .orderBy("partition", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === want.toSeq)
    assert(got.length === 200)
  }

  test("pushdown: partition predicates prune planning, offset range narrows tasks, columns prune") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = writeLog(200, 4) // 50 offsets per partition
    val df = spark.read.format("graftlog").option("path", dir).load()
      .filter(col("partition") === 2 && col("offset") < 5)
      .select("key")
    val got = df.collect().map(_.getString(0)).sorted
    // parity vs the unpruned read
    val want = spark.read.format("graftlog").option("path", dir).load()
      .collect().filter(r => r.getInt(0) == 2 && r.getLong(1) < 5)
      .map(_.getString(2)).sorted
    assert(got.toSeq === want.toSeq && got.length === 5)
    val scan = flattenPlan(df.queryExecution.executedPlan).collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec:\n" +
      df.queryExecution.executedPlan.toString.take(2000)))
    // partition pruning happened at PLANNING: one task, narrowed range
    val parts = scan.inputPartitions.collect { case g: GraftLogInputPartition => g }
    assert(parts.length === 1, s"planned ${parts.length} partitions")
    assert(parts.head.partition === 2 && parts.head.until <= 5L,
      s"task not narrowed: ${parts.head}")
    // column pruning reached the reader schema
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("key"),
      scan.scan.readSchema().treeString)
    // the claimed-pushed filters appear in the scan description
    assert(scan.scan.description().contains("partition"),
      scan.scan.description())
  }

  test("latestOffset reads footer statistics only; offsets are dense per partition") {
    val dir = writeLog(120, 3)
    val latest = GraftLog.latestOffsets(dir, new org.apache.hadoop.conf.Configuration())
    assert(latest === Map(0 -> 40L, 1 -> 40L, 2 -> 40L))
  }

  test("maxOffsetsPerTrigger splits the budget proportionally over backlogs") {
    val dir = writeLog(400, 4)
    val sink = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long)]()
    val q = spark.readStream.format("graftlog").option("path", dir)
      .option("maxOffsetsPerTrigger", "100").load()
      .writeStream.trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.add(id -> df.count()); ()
      }.start()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (sink.asInstanceOf[java.util.List[(Long, Long)]].size() < 4 &&
          System.nanoTime() < deadline) Thread.sleep(100)
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val batches = sink.asScala.toSeq.sortBy(_._1).map(_._2).filter(_ > 0)
    assert(batches.sum === 400, s"batches=$batches")
    // every admission-bounded batch is exactly the 100-row budget
    assert(batches.forall(_ <= 100), s"a batch exceeded the budget: $batches")
    assert(batches.count(_ == 100) >= 3, s"expected 4 full batches: $batches")
  }

  test("ThrottlePolicy shapes the V2 source's admission via launchShaped") {
    import graft.engine.{QueryCoordinator, ThrottlePolicy}
    val dir = writeLog(400, 4)
    val policy = ThrottlePolicy(
      defaultRatePerTrigger = 1000,
      throttledRatePerTrigger = 60,
      throttledPattern = Some("sideline".r))
    val coord = new QueryCoordinator(spark, maxConcurrentQueries = 1)
    val batches = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]()
    val q = coord.launchShaped("fh:sideline:replay", policy) { shaping =>
      spark.readStream.format("graftlog").option("path", dir)
        .option("maxOffsetsPerTrigger", shaping.ratePerTrigger.toString)
        .load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.add(df.count()); ()
        }.start()
    }
    q.awaitTermination(60000)
    coord.close(5000)
    import scala.jdk.CollectionConverters._
    val sizes = batches.asScala.map(_.toLong).filter(_ > 0)
    assert(sizes.sum === 400)
    // the REGEX-matched throttled rate (60), not the default (1000),
    // reached the V2 source's admission control
    assert(sizes.forall(_ <= 60), s"a batch exceeded the throttled rate: $sizes")
    assert(sizes.length >= 7, s"expected >= 7 shaped batches: $sizes")
  }

  test("restart resumes from the committed per-partition positions") {
    val dir = writeLog(120, 4)
    val cp = java.nio.file.Files.createTempDirectory("graftlog-cp").toString
    val out = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    def run(expectTotal: Long): Unit = {
      val q = spark.readStream.format("graftlog").option("path", dir)
        .option("maxOffsetsPerTrigger", "40").load()
        .writeStream.option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => out.add(r.getLong(1) * 10 + r.getInt(0))); ()
        }.start()
      q.awaitTermination(60000)
      ()
    }
    run(120)
    import scala.jdk.CollectionConverters._
    val afterFirst = out.asScala.size
    assert(afterFirst === 120, s"first run delivered $afterFirst")
    // grow the log, restart from the same checkpoint: ONLY the new rows
    val extra = spark.range(1000, 1040)
      .selectExpr("cast(id % 4 as int) as partition", "30 + (id - 1000) div 4 as offset",
        "cast(id as string) as key", "concat('v', id) as value")
    extra.write.mode("append").partitionBy("partition")
      .parquet(dir)
    run(160)
    val total = out.asScala.size
    assert(total === 160, s"restart re-delivered or dropped rows: $total")
    // no duplicates: every (offset, partition) key is unique
    assert(out.asScala.toSet.size === 160)
  }

  test("produce: append assigns dense next offsets per partition; consumers poll them") {
    val dir = writeLog(40, 4) // 10 offsets per partition
    val before = GraftLog.latestOffsets(dir, new org.apache.hadoop.conf.Configuration())
    assert(before.values.toSet === Set(10L))
    def segFiles(p: Int): Int = new java.io.File(s"$dir/partition=$p")
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    val baseFiles0 = segFiles(0)
    // produce 12 new records across 3 of the 4 partitions
    val batch = spark.range(0, 12)
      .selectExpr("cast(id % 3 as int) as partition",
        "concat('k', id) as key", "concat('nv', id) as value")
    val after = GraftLog.append(batch, dir)
    assert(after === Map(0 -> 14L, 1 -> 14L, 2 -> 14L, 3 -> 10L), after.toString)
    // offsets stay DENSE per partition and the new rows read back typed
    val rows = spark.read.format("graftlog").option("path", dir).load()
    val perPart = rows.groupBy("partition")
      .agg(count(lit(1)).as("n"), max("offset").as("mx"), min("offset").as("mn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    perPart.foreach { case (p, n, mx, mn) =>
      assert(mn === 0L && mx === n - 1, s"partition $p not dense: n=$n max=$mx")
    }
    val newOnes = rows.filter(col("value").startsWith("nv")).count()
    assert(newOnes === 12)
    // each appended partition's batch landed as ONE new segment file
    // (the all-or-nothing unit the producer contract promises)
    assert(segFiles(0) === baseFiles0 + 1,
      s"partition 0 grew by ${segFiles(0) - baseFiles0} files, expected 1")

    // retry discipline: the optimistic-sequence check fails loudly on a
    // partition that already advanced past the captured base
    val stale = before // captured BEFORE the append above
    val err = intercept[IllegalArgumentException] {
      GraftLog.append(batch, dir, expectedBases = Some(stale))
    }
    assert(err.getMessage.contains("already advanced"), err.getMessage)
    // a null partition fails the batch instead of poisoning the layout
    val bad = spark.sql(
      "SELECT cast(null as int) AS partition, 'k' AS key, 'v' AS value")
    val nullErr = intercept[Exception] { GraftLog.append(bad, dir) }
    assert(nullErr.getMessage.contains("null/unparseable") ||
      Option(nullErr.getCause).exists(_.getMessage.contains("null/unparseable")),
      nullErr.toString)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.contains("HIVE_DEFAULT")), "null partition leaked")
  }

  test("decode-level pruning: projection and offset range cut physically-read bytes") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graftlog-decode").toString
    // ONE partition, ONE fat segment with MANY row groups: values are
    // ~512 distinct chars each (dictionary can't collapse them), rows
    // sorted by offset so row-group stats are tight disjoint ranges
    spark.range(0, 20000).repartition(1).sortWithinPartitions("id")
      .selectExpr("cast(0 as int) as partition", "id as offset",
        "cast(id as string) as key",
        "concat_ws('', array_repeat(sha2(cast(id as string), 512), 4)) as value")
      .write.option("parquet.block.size", "65536")
      .partitionBy("partition").mode("overwrite").parquet(dir)
    val conf = new Configuration()
    val pdir = new Path(dir, "partition=0")
    val file = GraftLog.partFiles(pdir.getFileSystem(conf), pdir) match {
      case Seq(one) => one
      case more => fail(s"expected one segment file, got $more")
    }
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf),
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    assert(footer.getBlocks.size() > 3,
      s"fixture must be multi-row-group, got ${footer.getBlocks.size()} groups")

    // physically-fetched bytes around a direct drain of the connector's
    // OWN read path (the PartitionReader the tasks run); counted at the
    // parquet input stream — Hadoop FS statistics miss the ByteBuffer/
    // positioned reads parquet uses, so they can't see this. A PRIVATE
    // counter per drain: deltas of the process-global metric would be
    // polluted by any concurrent graftlog reader in this JVM (a leaked
    // streaming query from another suite).
    def drain(schema: StructType, from: Long, until: Long): (Long, Long) = {
      val counter = new java.util.concurrent.atomic.LongAdder
      val r = new GraftLogReaderFactory(schema, null, counter)
        .createReader(GraftLogInputPartition(0, from, until, Array(file.toString)))
      var n = 0L
      while (r.next()) { r.get(); n += 1 }
      r.close()
      (n, counter.sum())
    }
    val keyOnly = StructType(GraftLog.Schema.filter(_.name == "key"))

    val (fullRows, fullBytes) = drain(GraftLog.Schema, 0, 20000)
    assert(fullRows === 20000)
    // the counter sees real reads: a full drain fetches ~the whole file
    val fileLen = new java.io.File(file.toUri.getPath).length()
    assert(fullBytes * 2 > fileLen, s"counter undercounts: $fullBytes of $fileLen")
    // COLUMN PRUNING is physical: a key-only projection never reads the
    // fat value column chunks
    val (keyRows, keyBytes) = drain(keyOnly, 0, 20000)
    assert(keyRows === 20000)
    assert(keyBytes * 5 < fullBytes,
      s"projection did not cut decode: key-only $keyBytes vs full $fullBytes")
    // ROW-GROUP SKIPPING is physical: a tail slice of the multi-group
    // segment reads the slice's groups, not the segment
    val (tailRows, tailBytes) = drain(GraftLog.Schema, 19900, 20000)
    assert(tailRows === 100)
    assert(tailBytes * 5 < fullBytes,
      s"range filter did not skip row groups: tail $tailBytes vs full $fullBytes")
    // and the pruned reads stay CORRECT end-to-end through the provider
    val got = spark.read.format("graftlog").option("path", dir).load()
      .filter(col("offset") >= 19900).select("key").collect().map(_.getString(0))
    assert(got.map(_.toLong).sorted.toSeq === (19900L until 20000L))
  }

  test("splitCounts: proportional, >=1 per partition, never exceeds the hint or the backlog") {
    import GraftLogScan.splitCounts
    // hint at or below #partitions: no splitting
    assert(splitCounts(Seq(10L, 10L), 2) === Seq(1, 1))
    assert(splitCounts(Seq(10L, 10L), 1) === Seq(1, 1))
    assert(splitCounts(Nil, 8) === Nil)
    // even backlogs split evenly
    assert(splitCounts(Seq(100L, 100L), 4) === Seq(2, 2))
    // remainder goes to ascending partitions
    assert(splitCounts(Seq(10L, 10L, 10L), 5) === Seq(2, 2, 1))
    // the ADVICE counterexample: >=1 floors overshoot the hint — the
    // excess comes back from the LARGEST allocation, total == hint
    assert(splitCounts(Seq(100L, 1L, 1L, 1L, 1L), 6) === Seq(2, 1, 1, 1, 1))
    // tiny backlogs cap below the hint (never finer than 1 offset/task)
    assert(splitCounts(Seq(2L, 2L), 10) === Seq(2, 2))
    // skew: the hot partition takes nearly the whole budget
    val skewed = splitCounts(Seq(1000000L, 10L, 10L), 16)
    assert(skewed.head >= 13 && skewed.sum <= 16, skewed.toString)
    // property sweep: sum in [n, max(n, hint)], 1 <= k_i <= max(1, b_i)
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(8)
      val backlogs = Seq.fill(n)(rnd.nextInt(1000).toLong)
      val hint = 1 + rnd.nextInt(40)
      val ks = splitCounts(backlogs, hint)
      assert(ks.length === n)
      assert(ks.forall(_ >= 1), s"$backlogs hint=$hint -> $ks")
      ks.zip(backlogs).foreach { case (k, b) =>
        assert(k <= math.max(1L, b), s"$backlogs hint=$hint -> $ks")
      }
      assert(ks.sum >= n && ks.sum <= math.max(n, hint),
        s"$backlogs hint=$hint -> $ks (sum ${ks.sum})")
    }
  }

  test("minPartitions: sub-ranges tile without loss or duplication; bad values fail loudly") {
    val dir = writeLog(200, 4) // 50 offsets per partition
    // plan-level: splitting tiles each partition's [from, until) exactly
    val conf = new org.apache.hadoop.conf.Configuration()
    val latest = GraftLog.latestOffsets(dir, conf)
    val parts = GraftLogScan.plan(dir, conf,
      latest.map { case (p, _) => p -> 0L }, latest,
      GraftLogBounds.All, minSplits = 16)
      .collect { case g: GraftLogInputPartition => g }
    assert(parts.length === 16, s"planned ${parts.length} tasks")
    parts.groupBy(_.partition).foreach { case (p, ps) =>
      val ranges = ps.sortBy(_.from).map(g => (g.from, g.until)).toSeq
      assert(ranges.head._1 === 0L && ranges.last._2 === 50L,
        s"partition $p ranges $ranges")
      ranges.sliding(2).foreach {
        case Seq((_, u), (f, _)) => assert(u === f, s"partition $p gap/overlap: $ranges")
        case _ => ()
      }
    }
    // end-to-end: the split batch read equals the unsplit read exactly
    val unsplit = spark.read.format("graftlog").option("path", dir).load()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val split = spark.read.format("graftlog").option("path", dir)
      .option("minPartitions", "16").load()
    assert(split.rdd.getNumPartitions === 16,
      s"expected 16 tasks, got ${split.rdd.getNumPartitions}")
    val got = split.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === unsplit.toSeq && got.length === 200)
    // streaming: the same hint fans out micro-batch tasks, rows intact
    val n = new java.util.concurrent.atomic.AtomicLong
    val maxTasks = new java.util.concurrent.atomic.AtomicLong
    val q = spark.readStream.format("graftlog").option("path", dir)
      .option("minPartitions", "12").load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        maxTasks.updateAndGet(m => math.max(m, df.rdd.getNumPartitions.toLong))
        n.addAndGet(df.count()); ()
      }.start()
    q.awaitTermination(60000)
    assert(n.get() === 200, s"streaming split read delivered ${n.get()}")
    assert(maxTasks.get() === 12, s"streaming fan-out was ${maxTasks.get()} tasks")
    // invalid hints are planning-time errors, not silent no-ops
    for (bad <- Seq("abc", "0", "-3")) {
      val e = intercept[Exception] {
        spark.read.format("graftlog").option("path", dir)
          .option("minPartitions", bad).load().collect()
      }
      def all(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: all(t.getCause)
      assert(all(e).exists(t => Option(t.getMessage)
        .exists(_.contains("must be a positive integer"))), e.toString)
    }
  }

  test("reported statistics: exact row counts, window-scaled bytes, and auto-broadcast in joins") {
    val dir = writeLog(400, 4) // 100 offsets per partition
    def stats(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      val scan = flattenPlan(df.queryExecution.executedPlan).collectFirst {
        case b: BatchScanExec => b
      }.get.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      scan.estimateStatistics()
    }
    val full = spark.read.format("graftlog").option("path", dir).load()
    val s0 = stats(full)
    assert(s0.numRows.getAsLong === 400L)
    assert(s0.sizeInBytes.getAsLong > 0L)
    // a planning-time window shrinks the estimate proportionally
    val half = spark.read.format("graftlog").option("path", dir)
      .option("startingOffsets", """{"0":50,"1":50,"2":50,"3":50}""").load()
    val s1 = stats(half)
    assert(s1.numRows.getAsLong === 200L)
    assert(s1.sizeInBytes.getAsLong < s0.sizeInBytes.getAsLong)
    // Catalyst sees the stats: joining a big frame against the small
    // log broadcasts the LOG side with no explicit hint
    val big = spark.range(0, 500000).selectExpr("cast(id % 4 as int) as partition",
      "id as x")
    val joined = big.join(full.select("partition", "key"), Seq("partition"))
    val hasBroadcast = flattenPlan(joined.queryExecution.executedPlan).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _ => false
    }
    assert(hasBroadcast,
      "small graftlog side did not auto-broadcast:\n" +
        joined.queryExecution.executedPlan.toString.take(1500))
  }

  test("runtime filtering prunes partitions between planning and execution (V2 DPP hook)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.sources.{EqualTo, In}
    val dir = writeLog(200, 4)
    // the hook itself: a runtime In on partition drops whole directories
    val scan = new GraftLogScan(dir, Map.empty)
    assert(scan.filterAttributes().map(_.describe()).toSeq === Seq("partition"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("partition", Array(1, 3))))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("partition", 3))) // intersects, not replaces
    val parts = scan.toBatch.planInputPartitions()
      .collect { case g: GraftLogInputPartition => g }
    assert(parts.map(_.partition).toSeq === Seq(3),
      s"runtime filter not applied: ${parts.map(_.partition).toSeq}")

    // end to end: a broadcast join whose dim side filters partition
    // plants a runtime filter on the scan, and results stay exact
    val sparkS = spark
    import sparkS.implicits._
    val dim = Seq((2, "keep")).toDF("partition", "tag")
    val fact = spark.read.format("graftlog").option("path", dir).load()
    val joined = fact.join(broadcast(dim), Seq("partition"))
    val rows = joined.collect()
    assert(rows.length === 50 && rows.forall(_.getAs[Int]("partition") === 2))
    val exec = flattenPlan(joined.queryExecution.executedPlan).collectFirst {
      case b: BatchScanExec => b
    }.get
    if (exec.runtimeFilters.nonEmpty) {
      val planned = exec.inputPartitions
        .collect { case g: GraftLogInputPartition => g }
      assert(planned.map(_.partition).toSeq === Seq(2),
        s"runtime filter present but scan read ${planned.map(_.partition).toSeq}")
    }
  }

  test("minOffsetsPerTrigger defers sub-threshold batches until backlog or delay; cap still binds") {
    val dir = writeLog(40, 4) // backlog 40 < min 100
    val batches = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]()
    val q = spark.readStream.format("graftlog").option("path", dir)
      .option("minOffsetsPerTrigger", "100")
      .option("maxOffsetsPerTrigger", "60")
      .option("maxTriggerDelayMs", "3600000") // the delay must NOT fire here
      .load()
      .writeStream.trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.count()); ()
      }.start()
    try {
      // the gate holds: several trigger cycles, zero row-bearing batches
      Thread.sleep(2000)
      import scala.jdk.CollectionConverters._
      assert(batches.asScala.forall(_ == 0L),
        s"min gate leaked a sub-threshold batch: ${batches.asScala.filter(_ > 0)}")
      // grow past the threshold: batches flow, capped at 60 per trigger
      spark.range(2000, 2070)
        .selectExpr("cast(id % 4 as int) as partition",
          "(10 + (id - 2000) div 4) as offset",
          "cast(id as string) as key", "concat('v', id) as value")
        .repartition(col("partition"))
        .write.mode("append").partitionBy("partition").parquet(dir)
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (batches.asScala.map(_.toLong).sum < 60 && System.nanoTime() < deadline)
        Thread.sleep(100)
      val sizes = batches.asScala.map(_.toLong).filter(_ > 0)
      assert(sizes === Seq(60L), s"expected one capped 60-row batch: $sizes")
      // the 50-row REMAINDER re-arms the gate (Kafka semantics: min is
      // judged per trigger, and the delay clock reset at the batch)
      Thread.sleep(1500)
      val after = batches.asScala.map(_.toLong).filter(_ > 0)
      assert(after.sum === 60, s"gate did not re-arm on the remainder: $after")
    } finally q.stop()
  }

  test("minOffsetsPerTrigger: the maxTriggerDelay bound releases a small backlog") {
    val dir = writeLog(40, 4)
    val n = new java.util.concurrent.atomic.AtomicLong
    val q = spark.readStream.format("graftlog").option("path", dir)
      .option("minOffsetsPerTrigger", "1000000")
      .option("maxTriggerDelayMs", "1500")
      .load()
      .writeStream.trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        n.addAndGet(df.count()); ()
      }.start()
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (n.get() < 40 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(n.get() === 40,
        s"delay bound did not release the backlog: ${n.get()}")
    } finally q.stop()
  }

  test("aggregate pushdown: count/min/max answered from footer stats, no data task planned") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = writeLog(200, 4) // 50 offsets per partition
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      flattenPlan(df.queryExecution.executedPlan).collectFirst {
        case b: BatchScanExec => b
      }.getOrElse(fail("no BatchScanExec"))

    val cnt = spark.read.format("graftlog").option("path", dir).load()
      .groupBy().count()
    assert(cnt.collect().head.getLong(0) === 200L)
    val cntScan = scanOf(cnt)
    assert(cntScan.scan.description().contains("PushedAggregates"),
      cntScan.scan.description())
    // the single planned task carries the PRECOMPUTED answer — no files
    assert(cntScan.inputPartitions.forall(_.isInstanceOf[GraftLogAggResult]),
      "aggregate was not answered from metadata")

    val mm = spark.read.format("graftlog").option("path", dir).load()
      .groupBy().agg(min("offset"), max("offset"), count(lit(1)))
    val row = mm.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((0L, 49L, 200L)))
    assert(scanOf(mm).scan.description().contains("PushedAggregates"))

    // pushed partition/offset filters stay exact under the metadata path
    val filtered = spark.read.format("graftlog").option("path", dir).load()
      .filter(col("partition") === 2 && col("offset") >= 10).groupBy().count()
    assert(filtered.collect().head.getLong(0) === 40L)
    assert(scanOf(filtered).scan.description().contains("PushedAggregates"))

    // a RESIDUAL filter (key) disqualifies the metadata answer — the
    // normal scan runs and the result is still exact
    val residual = spark.read.format("graftlog").option("path", dir).load()
      .filter(col("key") === "7").groupBy().count()
    assert(residual.collect().head.getLong(0) === 1L)
    assert(!scanOf(residual).scan.description().contains("PushedAggregates"),
      "residual-filtered aggregate must not be answered from metadata")

    // grouping is never pushed; per-partition counts stay exact
    val grouped = spark.read.format("graftlog").option("path", dir).load()
      .groupBy("partition").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(grouped === Map(0 -> 50L, 1 -> 50L, 2 -> 50L, 3 -> 50L))
  }

  test("limit pushdown truncates the planned windows to the limit") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = writeLog(200, 4)
    val df = spark.read.format("graftlog").option("path", dir).load().limit(7)
    assert(df.collect().length === 7)
    val scan = flattenPlan(df.queryExecution.executedPlan).collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec"))
    val widths = scan.inputPartitions
      .collect { case g: GraftLogInputPartition => g.until - g.from }
    assert(widths.sum === 7L,
      s"limit not pushed into planning: widths=${widths.toSeq}")
  }

  test("batch out-of-range offsets follow failOnDataLoss; latest/earliest misuse is a clear error") {
    val dir = writeLog(40, 4) // 10 offsets per partition
    def all(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: all(t.getCause)
    def msgHas(t: Throwable, s: String): Boolean =
      all(t).exists(x => Option(x.getMessage).exists(_.contains(s)))
    val bad = """{"0":99,"1":0,"2":0,"3":0}"""
    // a window past the log end means truncation/rewrite — loud by default
    val e = intercept[Exception] {
      spark.read.format("graftlog").option("path", dir)
        .option("startingOffsets", bad).load().collect()
    }
    assert(msgHas(e, "out of range"), e.toString)
    // opt-out clamps: partition 0 contributes nothing, the rest replay
    val clamped = spark.read.format("graftlog").option("path", dir)
      .option("startingOffsets", bad).option("failOnDataLoss", "false").load()
    assert(clamped.count() === 30)
    val e2 = intercept[Exception] {
      spark.read.format("graftlog").option("path", dir)
        .option("startingOffsets", "latest").load().collect()
    }
    assert(msgHas(e2, "streaming-only"), e2.toString)
    val e3 = intercept[Exception] {
      spark.read.format("graftlog").option("path", dir)
        .option("endingOffsets", """{"0":99,"1":10,"2":10,"3":10}""").load().collect()
    }
    assert(msgHas(e3, "out of range"), e3.toString)
    // r13-advice: an explicit start for a partition ABSENT from the log
    // (truncated/rewritten underneath the caller) must not be silently
    // dropped into an empty window — loud by default, skip on opt-out
    val vanished = """{"0":0,"1":0,"2":0,"3":0,"9":5}"""
    val e4 = intercept[Exception] {
      spark.read.format("graftlog").option("path", dir)
        .option("startingOffsets", vanished).load().collect()
    }
    assert(msgHas(e4, "does not exist"), e4.toString)
    val skipped = spark.read.format("graftlog").option("path", dir)
      .option("startingOffsets", vanished)
      .option("failOnDataLoss", "false").load()
    assert(skipped.count() === 40)
  }

  test("out-of-range start: fails loudly by default, clamps under failOnDataLoss=false") {
    val dir = writeLog(40, 4) // 10 offsets per partition
    val bad = """{"0":99,"1":0,"2":0,"3":0}"""
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graftlog").option("path", dir)
        .option("startingOffsets", bad).load()
        .writeStream.format("noop").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(30000)
    }
    assert(err.getMessage.contains("out of range") ||
      Option(err.getCause).exists(_.getMessage.contains("out of range")))

    val n = new java.util.concurrent.atomic.AtomicLong
    val q2 = spark.readStream.format("graftlog").option("path", dir)
      .option("startingOffsets", bad).option("failOnDataLoss", "false").load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        n.addAndGet(df.count()); ()
      }.start()
    q2.awaitTermination(30000)
    // partition 0 clamped to its end (contributes 0), the rest replay fully
    assert(n.get() === 30, s"clamped run delivered ${n.get()}")
  }
}
