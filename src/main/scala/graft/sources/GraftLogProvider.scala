package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, ReadMinRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/**
 * NATIVE DataSource V2 micro-batch connector for the partitioned
 * offset log — the reference Consumer contract
 * (kafka/Consumer.java:199-364 assign/seek/poll,
 * `PartitionOffsetManager` positions) expressed at the level Spark
 * actually models sources: a [[MicroBatchStream]] whose [[Offset]] IS
 * the per-partition next-read position map (the reference's
 * ConsumerState), whose `planInputPartitions(start, end)` is
 * assign+seek (one InputPartition per log partition, offset-range
 * bounded), and whose admission control
 * ([[SupportsAdmissionControl.latestOffset(Offset, ReadLimit)]])
 * implements `maxOffsetsPerTrigger` by splitting the row budget over
 * partition backlogs proportionally — Kafka-source semantics, and the
 * hook [[graft.engine.ThrottlePolicy]] shapes.
 *
 * Unlike [[FileLogSource]] (which delegates offset tracking to the
 * file-stream source's file-level checkpoint), this connector OWNS its
 * offsets: restart resumes from the committed per-partition positions,
 * an out-of-range start follows `failOnDataLoss` (fail, or clamp and
 * warn — kafka/Consumer.java:548-590's recovery), and `latestOffset`
 * reads only parquet FOOTER statistics (metadata RPCs, the position-
 * lookup analogue — never data).
 *
 * Layout: parquet files under `dir/partition=<p>/`, each carrying
 * (offset, key, value) — the Kafka segment-directory shape;
 * [[GraftLog.materialize]] writes it from any (partition, offset, key,
 * value) frame. Offsets are dense per partition from 0 (the fixture
 * log contract); `offset` = next position to read (exclusive end).
 *
 * Scale shape: planning is metadata-only (directory listing + footer
 * stats per partition); each task reads its own partition directory's
 * files bounded to [start, end). The bounds are pushed into the
 * parquet DECODE itself ([[GraftLogReaderFactory]]): the offset range
 * rides a parquet record filter whose row-group statistics skip whole
 * groups outside the range, and the requested projection prunes the
 * read schema so unrequested payload columns are never decompressed —
 * both asserted by decoded-bytes measurements in the suite.
 */
object GraftLog {
  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType), StructField("value", StringType)))

  /** Write a (partition, offset, key, value) frame into the V2 log
    * layout (one directory per partition — the Kafka segment shape). */
  def materialize(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.select("partition", "offset", "key", "value")
      .write.mode("overwrite").partitionBy("partition").parquet(dir)

  /** PRODUCE into the log — the reference's emit side (S6) over the
    * native layout: each record of `df` (partition, key, value) gets
    * the next dense offset of its partition (current end position from
    * footer stats + intra-batch rank) and lands as a new segment file.
    * Intra-batch order is (key, value) — producers needing a specific
    * order pre-assign offsets and use [[materialize]]-style writes.
    * Null or unparseable partition values fail the batch loudly (a
    * silently-coerced null would write a `__HIVE_DEFAULT_PARTITION__`
    * directory that poisons every later read of the log).
    *
    * Single producer per log (the marker-namespace stance). The frame
    * is hash-partitioned BY partition BEFORE offsets are assigned (one
    * exchange serves both the rank window and the write) so each
    * partition's batch is ONE task = ONE new segment file
    * (`maxRecordsPerFile` is pinned off for this write — a split
    * segment would break the unit): the parquet committer then makes
    * every partition's append all-or-nothing — a commit-phase tear can
    * lose a whole partition's segment, never a slice of one.
    *
    * Retry discipline: losing a partition's segment keeps its offsets a
    * dense prefix, but a MULTI-partition batch can tear with SOME
    * partitions committed — a blind retry would duplicate those. Pass
    * `expectedBases` (the positions captured before the first attempt)
    * and the retry fails loudly on any partition that already
    * committed, naming it so the producer can drop its rows — the
    * optimistic-sequence check a transactional producer runs.
    *
    * Returns the new end position per partition. Consumers see the
    * appended rows on their next `latestOffset` poll. */
  def append(df: org.apache.spark.sql.DataFrame, dir: String,
      expectedBases: Option[Map[Int, Long]] = None): Map[Int, Long] = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val bases = latestOffsets(dir, conf)
    expectedBases.foreach { want =>
      val moved = want.filter { case (p, b) => bases.getOrElse(p, 0L) != b }
      require(moved.isEmpty,
        s"append precondition failed — partitions already advanced past the " +
          s"expected bases (committed by a previous attempt?): " +
          moved.map { case (p, b) => s"$p: expected $b, found ${bases.getOrElse(p, 0L)}" }
            .mkString(", "))
    }
    writeAssigned(df, dir,
      bases.map { case (p, b) => p -> (b, true) })
    latestOffsets(dir, conf)
  }

  /** THE segment write both producer faces share — [[append]] and
    * [[appendBatch]] differ only in which partitions are still pending
    * and where the bases come from, so the null check, the single
    * exchange, the (key, value) offset window, and the
    * one-file-per-partition contract live exactly once. `state` maps a
    * partition to (base, pending); unknown partitions (introduced by
    * the batch) default to (0, pending). */
  private def writeAssigned(df: org.apache.spark.sql.DataFrame, dir: String,
      state: Map[Int, (Long, Boolean)]): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val stateDf = state.toSeq
      .map { case (p, (b, pend)) => (p, b, pend) }
      .toDF("partition", "__base", "__pending")
    val w = Window.partitionBy("partition").orderBy("key", "value")
    // the null check lives INSIDE the used column (coalesce evaluates
    // lazily) — a dropped assert column would be pruned away unexecuted
    df.select(coalesce(col("partition").cast("int"), expr(
          "CAST(assert_true(false, 'null/unparseable partition in append batch') AS INT)"))
          .as("partition"),
        col("key"), col("value"))
      // ONE hash exchange on partition satisfies BOTH the window's
      // required distribution and the one-file-per-partition write
      .repartition(col("partition"))
      .join(broadcast(stateDf), Seq("partition"), "left_outer")
      .filter(coalesce(col("__pending"), lit(true)))
      .withColumn("offset",
        coalesce(col("__base"), lit(0L)) +
          row_number().over(w).cast("long") - 1)
      .select("partition", "offset", "key", "value")
      .write.mode("append").option("maxRecordsPerFile", 0L)
      .partitionBy("partition").parquet(dir)
  }

  /** EXACTLY-ONCE produce for foreachBatch pipelines — [[append]]
    * unified with the [[graft.streaming.IdempotentBatchSink]] commit
    * protocol. foreachBatch is at-least-once: a crash between the
    * producer's write and the checkpoint commit re-delivers the SAME
    * batch with the SAME `batchId`, and the bare [[append]]'s
    * optimistic-sequence check would fail that replay loudly instead of
    * absorbing it. This face makes the replay a no-op:
    *
    *  1. `_producer/<producerId>/<id>.intent` records the per-partition
    *     base positions BEFORE the first attempt touches the log —
    *     every replay of `batchId` reuses the FIRST attempt's bases;
    *  2. rows land only for partitions still AT their base — a
    *     partition whose position advanced past it already committed
    *     this batch's segment on a prior attempt (single producer:
    *     nothing else can move positions), so its rows are dropped,
    *     never duplicated. Per-partition segments are all-or-nothing
    *     ([[append]]'s one-file contract), so "advanced" is never a
    *     torn half;
    *  3. `_producer/<producerId>/<id>` marks the batch done — a
    *     fully-committed replay short-circuits on it before touching
    *     anything.
    *
    * `producerId` SCOPES the marker namespace to one logical pipeline:
    * batchIds restart from 0 whenever a checkpoint is recreated, and an
    * unscoped namespace would make the new run's early batchIds collide
    * with the old run's surviving done markers — silently dropping
    * fresh batches as "replays". Use the streaming query's id (what the
    * V2 sink does), or a new producerId per pipeline incarnation.
    *
    * ONE producer per log at a time, and that producer must route every
    * write through this face (an interleaved bare [[append]] would
    * advance positions the inference in step 2 attributes to the
    * replayed batch). Markers older than `batchId - 16` are pruned on
    * commit — Spark only ever re-delivers the latest unacknowledged
    * batch, so the window is already generous.
    *
    * Returns the end position per partition after the batch. */
  def appendBatch(df: org.apache.spark.sql.DataFrame, dir: String,
      batchId: Long, producerId: String = "default"): Map[Int, Long] = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val markers = new ProducerMarkers(dir, producerId, conf)
    if (markers.done(batchId)) return latestOffsets(dir, conf)

    val current = latestOffsets(dir, conf)
    val bases = markers.basesFor(batchId, current)
    bases.foreach { case (p, b) =>
      require(current.getOrElse(p, 0L) >= b,
        s"log $dir partition $p regressed below the batch $batchId base " +
          s"($b -> ${current.getOrElse(p, 0L)}) — was the log rewritten " +
          "underneath the producer?")
    }

    // per-partition state for the batch: the FIRST attempt's base and
    // whether the partition is still at it (pending). Partitions the
    // batch introduces (absent from both maps) default to (0, pending)
    // inside writeAssigned's left-outer join.
    writeAssigned(df, dir,
      (bases.keySet ++ current.keySet).map { p =>
        p -> ((bases.getOrElse(p, 0L),
          current.getOrElse(p, 0L) == bases.getOrElse(p, 0L)))
      }.toMap)

    markers.markDone(batchId)
    latestOffsets(dir, conf)
  }

  /** The (DataFrame, batchId) foreachBatch shape over [[appendBatch]] —
    * plug a streaming query's output straight into the log. Pass the
    * query's id (or any per-pipeline token) as `producerId` so a
    * recreated checkpoint's restarted batchIds cannot collide with an
    * earlier incarnation's markers. */
  def sink(dir: String, producerId: String = "default")
      : (org.apache.spark.sql.DataFrame, Long) => Unit =
    (df, id) => { appendBatch(df, dir, id, producerId); () }

  private[sources] def writeSmall(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private[sources] def readSmall(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](256)
        var n = in.read(b)
        while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
        Some(buf.toString("UTF-8").trim)
      } finally in.close()
    }

  private[sources] def partitionDirs(dir: String, conf: Configuration): Map[Int, Path] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Map.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("partition=") =>
        st.getPath.getName.stripPrefix("partition=").toInt -> st.getPath
    }.toMap
  }

  private[sources] def partFileStatuses(
      fs: FileSystem, d: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(d).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.endsWith(".parquet") && !n.startsWith("_")
      }.sortBy(_.getPath.getName)

  private[sources] def partFiles(fs: FileSystem, d: Path): Seq[Path] =
    partFileStatuses(fs, d).map(_.getPath)

  /** The session's Hadoop configuration — spark.hadoop.* settings and
    * filesystem credentials MUST reach every FS call (a bare
    * `new Configuration()` only works on filesystems needing zero
    * config); falls back to a bare one outside any session (tests of
    * the pure helpers). */
  private[sources] def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** A file's offset envelope from its parquet footer: the [min, max]
    * over stats-bearing row groups, plus `complete` = every row group
    * carried stats (only then may PLANNING prune the file — an
    * incomplete envelope must never hide rows). */
  private[sources] final case class FileEnvelope(
      file: String, statsMin: Long, statsMax: Long, complete: Boolean,
      len: Long = 0L) {
    def overlaps(from: Long, until: Long): Boolean =
      !complete || (statsMax >= from && statsMin < until)
  }

  // log segments are immutable once written (append-only layout, fresh
  // file names per append) — footer envelopes cache per JVM so a
  // short-trigger stream reads each footer ONCE, not twice per batch.
  // BOUNDED (LRU) so a long-lived driver over a huge log stays flat,
  // and keyed by (path, mtime, length) so a non-Spark writer that
  // reuses a segment file name is re-read, never served a stale
  // envelope that would corrupt positions and pruning.
  private val envelopeCache =
    new graft.ops.LruCache[(String, Long, Long), FileEnvelope](65536)

  /** Per-file offset envelopes from parquet FOOTER statistics — the
    * metadata that both positions ([[latestOffsets]]) and file-level
    * PLANNING pruning read; never data pages. */
  private[sources] def fileOffsetRanges(
      d: Path, conf: Configuration): Seq[FileEnvelope] = {
    val fs = d.getFileSystem(conf)
    partFileStatuses(fs, d).map { st =>
      val f = st.getPath
      envelopeCache.getOrElseUpdate(
        (f.toString, st.getModificationTime, st.getLen)) {
        val footer = ParquetFileReader.readFooter(
          HadoopInputFile.fromPath(f, conf),
          org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
        val z = (Long.MaxValue, -1L, true)
        val (mn, mx, complete) = footer.getBlocks.asScala.foldLeft(z) {
          case ((a0, a1, c0), b) =>
            b.getColumns.asScala.find(_.getPath.toDotString == "offset") match {
              case Some(c) if c.getStatistics != null && !c.getStatistics.isEmpty =>
                (math.min(a0, c.getStatistics.genericGetMin
                  .asInstanceOf[java.lang.Number].longValue()),
                  math.max(a1, c.getStatistics.genericGetMax
                    .asInstanceOf[java.lang.Number].longValue()), c0)
              case _ => (a0, a1, false) // a stats-less row group: envelope
                // stays usable for positions, pruning is disabled
            }
        }
        FileEnvelope(f.toString, mn, mx, complete, st.getLen)
      }
    }
  }

  /** ONE partition's end position from footer stats — the task-local
    * base lookup the V2 writers use (a full [[latestOffsets]] per task
    * would read every partition's footers for one answer). */
  private[sources] def partitionEnd(dir: String, p: Int, conf: Configuration): Long = {
    val d = new Path(dir, s"partition=$p")
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) 0L
    else fileOffsetRanges(d, conf).foldLeft(-1L)((a, e) =>
      math.max(a, e.statsMax)) + 1
  }

  /** Per-partition END position (max offset + 1) from parquet FOOTER
    * statistics only — the metadata-cost position lookup. A stats-less
    * row group cannot advance the position (its rows become readable
    * once any stats-bearing group covers their range); stats are always
    * present for Spark-written segments. */
  private[sources] def latestOffsets(dir: String, conf: Configuration): Map[Int, Long] =
    validatedListing(dir, conf, "latestOffsets") {
      partitionDirs(dir, conf).map { case (p, d) =>
        val maxOff = fileOffsetRanges(d, conf)
          .foldLeft(-1L)((acc, e) => math.max(acc, e.statsMax))
        p -> (maxOff + 1)
      }
    }

  /** Run a LISTING-dependent read under the maintenance seqlock (see
    * [[GraftLogMaintenance]]): the compaction swap and TRUNCATE delete
    * visible files, so a listing that lands inside their window can
    * assemble a silent SUBSET — missing files only fail loudly when a
    * pre-window listing reads a post-window state, not the other way
    * around. Re-reading the seq after the body and retrying on
    * odd-or-changed makes every accepted listing provably outside any
    * maintenance window; exhausting retries fails loudly (the contract
    * is loud-or-valid, never silent). Cost: two tiny metadata reads per
    * listing — noise next to the footer sweeps the listing feeds. */
  private[sources] def validatedListing[T](dir: String, conf: Configuration,
      what: String)(body: => T): T = {
    val fs = new Path(dir).getFileSystem(conf)
    var attempt = 0
    while (attempt < 4) {
      val s0 = GraftLogMaintenance.maintenanceSeq(fs, dir)
      if (s0 % 2 == 0) {
        val out = body
        if (GraftLogMaintenance.maintenanceSeq(fs, dir) == s0) return out
      }
      attempt += 1
      if (attempt < 4) Thread.sleep(25L * attempt)
    }
    throw new IllegalStateException(
      s"graftlog $what at $dir kept racing log maintenance " +
        s"(compaction/TRUNCATE held or churned the _maint/SEQ lock " +
        s"$attempt times) — run CALL <catalog>.system.recover_compaction " +
        "if a maintenance crash left the lock held")
  }

  // ---- offset JSON (sorted keys — byte-stable for the checkpoint) ----
  private[sources] def offsetsToJson(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")

  /** Streaming-checkpoint form: the partition map plus the log
    * incarnation the offsets were committed under (`"_inc"`, r20 — the
    * TRUNCATE stamp). A negative incarnation (batch options, legacy
    * checkpoints) serializes without the key, byte-identical to the
    * classic form. */
  private[sources] def offsetsToJson(m: Map[Int, Long], inc: Long): String =
    if (inc < 0) offsetsToJson(m)
    else {
      val body = m.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" } :+
        s""""_inc":$inc"""
      body.mkString("{", ",", "}")
    }

  private[sources] def offsetsFromJson(s: String): Map[Int, Long] =
    offsetsAndIncFromJson(s)._1

  /** Parse offsets + the `_inc` incarnation stamp (-1 when absent — a
    * legacy checkpoint or a user-supplied option map). */
  private[sources] def offsetsAndIncFromJson(s: String): (Map[Int, Long], Long) = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(s) match {
      case JObject(fields) =>
        val (incF, partF) = fields.partition(_._1 == "_inc")
        def num(k: String, v: JValue): Long = v match {
          case JInt(n) => n.toLong
          case JLong(n) => n
          case other => throw new IllegalArgumentException(s"bad offset $k=$other")
        }
        (partF.map { case (k, v) => k.toInt -> num(k, v) }.toMap,
          incF.headOption.map { case (k, v) => num(k, v) }.getOrElse(-1L))
      case other => throw new IllegalArgumentException(s"bad offset json: $other")
    }
  }
}

/** The `_producer/<producerId>/` marker namespace — ONE implementation
  * of the exactly-once produce protocol's on-disk contract, shared by
  * [[GraftLog.appendBatch]] and the V2 streaming sink's commit so the
  * two faces can never drift. `producerId` scopes a logical pipeline:
  * without it, a recreated checkpoint's restarted batchIds would
  * collide with a previous incarnation's surviving done markers and
  * silently drop fresh batches as "replays". */
private[sources] final class ProducerMarkers(
    dir: String, producerId: String,
    conf: org.apache.hadoop.conf.Configuration) {
  require(producerId.nonEmpty && !producerId.contains('/'),
    s"producerId must be a non-empty flat token, got '$producerId'")
  private val scope = new Path(new Path(dir, "_producer"), producerId)
  private val fs = scope.getFileSystem(conf)

  /** Has `id` fully committed? (The replay short-circuit.) */
  def done(id: Long): Boolean = fs.exists(new Path(scope, id.toString))

  /** The batch's pinned FIRST-attempt bases: read the intent, or pin
    * `current` as the intent when this is the first attempt. */
  def basesFor(id: Long, current: Map[Int, Long]): Map[Int, Long] = {
    val intent = new Path(scope, s"$id.intent")
    GraftLog.readSmall(fs, intent) match {
      case Some(json) => GraftLog.offsetsFromJson(json)
      case None =>
        fs.mkdirs(scope)
        GraftLog.writeSmall(fs, intent, GraftLog.offsetsToJson(current))
        current
    }
  }

  /** Commit the batch, then prune markers past the replay window
    * (Spark only ever re-delivers the latest unacknowledged batch). */
  def markDone(id: Long): Unit = {
    fs.mkdirs(scope)
    fs.create(new Path(scope, id.toString), true).close()
    fs.listStatus(scope).foreach { st =>
      val n = st.getPath.getName.stripSuffix(".intent")
      if (n.forall(_.isDigit) && n.nonEmpty && n.toLong <= id - 16)
        fs.delete(st.getPath, false)
    }
  }
}

/** @param incarnation the `_maint/INC` TRUNCATE counter the offsets
  *   were committed under (r20); -1 for legacy checkpoints and batch
  *   option maps, which serialize without the stamp. */
final case class GraftLogOffset(offsets: Map[Int, Long],
    incarnation: Long = -1L) extends Offset {
  override def json(): String = GraftLog.offsetsToJson(offsets, incarnation)
}

/** [[graft.sources.LogSource]] face over the V2 connector — what plugs
  * the native source into the engine surfaces that consume LogSources
  * ([[graft.streaming.StreamingFirehose]], the sideline machinery):
  * batch reads and `currentState` go through the connector's Batch
  * path (footer-stats positions), streaming through its
  * MicroBatchStream with its own offset checkpointing + admission
  * control. `rate` maps [[graft.engine.ThrottlePolicy]]'s
  * per-trigger budget onto `maxOffsetsPerTrigger`. */
final case class GraftLogSource(
    dir: String,
    namespace: String = "graftlog",
    rate: Option[Long] = None) extends LogSource {

  def read(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    spark.read.format("graftlog").option("path", dir).load()
      .withColumn("namespace",
        org.apache.spark.sql.functions.lit(namespace))

  def readStreamFrom(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val r = spark.readStream.format("graftlog").option("path", dir)
    rate.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString)).load()
      .withColumn("namespace",
        org.apache.spark.sql.functions.lit(namespace))
  }

  /** Snapshot-bounded replay STREAM (a RESUME's live face): the
    * exclusive watermarks become the connector's own startingOffsets —
    * pre-snapshot segments are never planned, not filtered out. */
  override def readStreamFrom(spark: org.apache.spark.sql.SparkSession,
      from: graft.model.ConsumerState): org.apache.spark.sql.DataFrame = {
    val start = from.offsets.collect {
      case (graft.model.ConsumerPartition(ns, p), off) if ns == namespace =>
        p -> (off + 1)
    }
    val r = spark.readStream.format("graftlog").option("path", dir)
      .option("startingOffsets", GraftLog.offsetsToJson(start))
    rate.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString)).load()
      .withColumn("namespace",
        org.apache.spark.sql.functions.lit(namespace))
  }

  /** Bounded replay through the connector's OWN offset options instead
    * of the trait's post-scan predicate: the window becomes
    * `startingOffsets`/`endingOffsets` at the scan, so planning prunes
    * pruned-out partitions and out-of-range FILES before any task runs
    * — the native analogue of the reference's assign+seek replay
    * (kafka/Consumer.java:199-311). Semantics match the trait exactly
    * (starting watermarks exclusive, endings inclusive, a partition
    * absent from the ending contributes nothing — LogSourceBoundsSuite's
    * contract), pinned by parity in GraftLogSidelineE2ESuite. */
  override def readBounded(
      spark: org.apache.spark.sql.SparkSession,
      starting: graft.model.ConsumerState,
      ending: Option[graft.model.ConsumerState]): org.apache.spark.sql.DataFrame = {
    def mine(s: graft.model.ConsumerState): Map[Int, Long] = s.offsets.collect {
      case (graft.model.ConsumerPartition(ns, p), off) if ns == namespace =>
        p -> (off + 1) // exclusive watermark -> first-to-read / exclusive end
    }
    val r = spark.read.format("graftlog").option("path", dir)
      .option("startingOffsets", GraftLog.offsetsToJson(mine(starting)))
    ending.fold(r)(e =>
        r.option("endingOffsets", GraftLog.offsetsToJson(mine(e))))
      .load()
      .withColumn("namespace",
        org.apache.spark.sql.functions.lit(namespace))
  }

  /** Positions from footer statistics — never a data scan (overrides
    * the trait's read-and-aggregate default). */
  override def currentState(spark: org.apache.spark.sql.SparkSession): graft.model.ConsumerState =
    graft.model.ConsumerState(
      GraftLog.latestOffsets(dir, GraftLog.sessionConf()).map { case (p, next) =>
        graft.model.ConsumerPartition(namespace, p) -> (next - 1)
      })
}

class GraftLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftLogTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graftlog requires option(\"path\", ...)")))
}

final class GraftLogTable(path: String) extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite
  with org.apache.spark.sql.connector.catalog.TruncatableTable {
  override def name(): String = s"graftlog(`$path`)"

  /** `TRUNCATE TABLE` — the explicit ops reset: every partition's
    * segments, the producer marker namespace, and any staging debris
    * are removed; the next append starts every partition at offset 0.
    * Live consumers of the old incarnation then fail their next batch
    * under `failOnDataLoss` (their committed positions are past the
    * new log end) — the loud outcome a rewound log must produce. */
  override def truncateTable(): Boolean = {
    val conf = GraftLog.sessionConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return true
    val targets = fs.listStatus(root)
      .filter { e =>
        val n = e.getPath.getName
        e.isDirectory && (n.startsWith("partition=") ||
          n == "_producer" || n == "_staging")
      }
    if (targets.isEmpty) return true
    // maintenance seqlock: racing readers go loud-or-valid instead of
    // assembling a partially-deleted (gapped) incarnation; a failed
    // truncate leaves it odd until the re-run or recover settles it
    GraftLogMaintenance.beginMaintenance(fs, path)
    // A partially failed delete must NOT report success: a surviving
    // partition dir means the next append resumes from its footer end
    // instead of offset 0, silently un-truncating the log.
    val survivors = targets.filter { e =>
      !fs.delete(e.getPath, true) && fs.exists(e.getPath)
    }
    if (survivors.nonEmpty)
      throw new IllegalStateException(
        s"TRUNCATE left ${survivors.length} entr${if (survivors.length == 1) "y" else "ies"} " +
          s"under $path: ${survivors.map(_.getPath.getName).mkString(", ")}")
    // stamp the NEW incarnation before settling the seqlock: a stale
    // streaming checkpoint then fails its next admission on the
    // incarnation mismatch even if the replacement log has already
    // grown past the committed offsets (r20 — the timing hole the
    // r19 offset-regression guards left open)
    GraftLogMaintenance.bumpIncarnation(fs, path)
    GraftLogMaintenance.endMaintenance(fs, path)
    true
  }
  override def schema(): StructType = GraftLog.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScanBuilder(path, options.asScala.toMap)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftLogWriteBuilder(path, info)
}

/** Pushdown surface of the connector: COLUMN PRUNING (the projection
  * reaches the parquet read schema — a 2-column projection never reads
  * or decodes payload column chunks) and FILTER PUSHDOWN on the log
  * coordinates — `partition`
  * equality/membership prunes whole partition directories at PLANNING
  * time, `offset` comparisons narrow each task's [from, until) range.
  * Both are applied EXACTLY, so they are claimed as pushed (Spark drops
  * its post-scan copy); anything else stays residual. */
final class GraftLogScanBuilder(path: String, options: Map[String, String])
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  import org.apache.spark.sql.sources._

  private var required: StructType = GraftLog.Schema
  private var pushed: Array[Filter] = Array.empty
  private var residualSeen = false
  private var pushedAgg: Option[Seq[String]] = None
  private var limit: Option[Int] = None

  // ---- AGGREGATE pushdown: COUNT/MIN(offset)/MAX(offset) from FOOTER
  // statistics alone. Offsets are DENSE per partition, so the planned
  // window width IS the exact row count and the window edges ARE the
  // exact min/max — a count over a 100 TB log is a metadata sweep, no
  // task ever reads a data page. Complete pushdown only (no grouping,
  // no residual data filter — a residual would make the metadata answer
  // wrong, so those shapes fall back to the normal scan).
  private def aggKinds(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def offsetRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference =>
          r.fieldNames().length == 1 && r.fieldNames()(0).equalsIgnoreCase("offset")
        case _ => false
      }
    if (agg.groupByExpressions().nonEmpty) None
    else {
      val kinds = agg.aggregateExpressions().toSeq.map {
        case _: CountStar => Some("count")
        case m: Min if offsetRef(m.column()) => Some("min_offset")
        case m: Max if offsetRef(m.column()) => Some("max_offset")
        case _ => None
      }
      if (kinds.nonEmpty && kinds.forall(_.isDefined)) Some(kinds.flatten)
      else None
    }
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    !residualSeen && aggKinds(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    !residualSeen && {
      aggKinds(agg) match {
        case Some(kinds) => pushedAgg = Some(kinds); true
        case None => false
      }
    }

  /** LIMIT pushdown: the planner truncates partition windows once the
    * cumulative width reaches the limit, so a `LIMIT 10` over a huge
    * log plans one sliver of one partition. Partial (Spark keeps its
    * own limit on top — the connector just stops planning rows it
    * cannot need). */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the connector's column order; empty projection (count(*))
    // keeps offset so the reader still has a row to count
    required =
      if (requiredSchema.isEmpty) StructType(GraftLog.Schema.filter(_.name == "offset"))
      else StructType(GraftLog.Schema.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  override def pushedFilters(): Array[Filter] = pushed

  /** (partition predicate, offset-range narrowing) from the pushed set. */
  private[sources] def bounds: GraftLogBounds = {
    import org.apache.spark.sql.sources._
    var parts: Option[Set[Int]] = None
    var minFrom = 0L
    var maxUntil = Long.MaxValue
    pushed.foreach {
      case EqualTo("partition", v: Int) =>
        parts = Some(parts.getOrElse(Set(v)).intersect(Set(v)))
      case In("partition", vs) =>
        val s = vs.collect { case i: Int => i }.toSet
        parts = Some(parts.fold(s)(_.intersect(s)))
      case GreaterThan("offset", v: Long) => minFrom = math.max(minFrom, v + 1)
      case GreaterThanOrEqual("offset", v: Long) => minFrom = math.max(minFrom, v)
      case LessThan("offset", v: Long) => maxUntil = math.min(maxUntil, v)
      case LessThanOrEqual("offset", v: Long) => maxUntil = math.min(maxUntil, v + 1)
      case _ => ()
    }
    GraftLogBounds(parts, minFrom, maxUntil)
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("partition", _: Int) => true
      case In("partition", vs) => vs.forall(_.isInstanceOf[Int])
      case GreaterThan("offset", _: Long) | GreaterThanOrEqual("offset", _: Long) => true
      case LessThan("offset", _: Long) | LessThanOrEqual("offset", _: Long) => true
      case _ => false
    }
    pushed = accepted
    residualSeen = residual.nonEmpty
    residual
  }

  override def build(): Scan = pushedAgg match {
    case Some(kinds) =>
      new GraftLogAggScan(path, options, bounds, kinds, pushed.map(_.toString))
    case None =>
      new GraftLogScan(path, options, required, bounds, pushed.map(_.toString),
        limit)
  }
}

/** Planning-time narrowing from pushed filters: partition membership +
  * a [minFrom, maxUntil) offset window applied to every partition. */
final case class GraftLogBounds(
    partitions: Option[Set[Int]], minFrom: Long, maxUntil: Long) {
  def keeps(p: Int): Boolean = partitions.forall(_.contains(p))
  def narrow(from: Long, until: Long): (Long, Long) =
    (math.max(from, minFrom), math.min(until, maxUntil))
}

object GraftLogBounds {
  val All: GraftLogBounds = GraftLogBounds(None, 0L, Long.MaxValue)
}

final class GraftLogScan(path: String, options: Map[String, String],
    required: StructType = GraftLog.Schema,
    bounds: GraftLogBounds = GraftLogBounds.All,
    pushedDesc: Array[String] = Array.empty,
    limitOpt: Option[Int] = None) extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required

  // RUNTIME partition pruning (the V2 dynamic-partition-pruning hook):
  // a join whose other side filters `partition` hands the surviving
  // values here AFTER planning but BEFORE planInputPartitions — whole
  // partition directories drop out of the scan at execution time, the
  // log-side analogue of DPP on a partitioned fact table.
  @volatile private var runtimeParts: Option[Set[Int]] = None
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("partition"))
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    filters.foreach {
      case In("partition", vs) =>
        val s = vs.collect { case n: java.lang.Number => n.intValue() }.toSet
        runtimeParts = Some(runtimeParts.fold(s)(_.intersect(s)))
      case EqualTo("partition", v: java.lang.Number) =>
        val s = Set(v.intValue())
        runtimeParts = Some(runtimeParts.fold(s)(_.intersect(s)))
      case _ => () // unsupported runtime filter: correctness unaffected
    }
  }
  /** Planning-time pushed bounds ∩ runtime-pruned partitions. */
  private def effectiveBounds: GraftLogBounds = runtimeParts match {
    case None => bounds
    case Some(rp) => bounds.copy(partitions =
      Some(bounds.partitions.fold(rp)(_.intersect(rp))))
  }

  // the DRIVER-side session conf, captured at scan construction; ships
  // to executors as a plain map (spark.hadoop.* / credentials included)
  private val conf = GraftLog.sessionConf()

  // ONE footer-stats position sweep per scan: Catalyst may call
  // estimateStatistics several times while optimizing (join reorder,
  // broadcast decisions) and planInputPartitions once more — each was a
  // full per-partition listing; a scan is one query, so the snapshot is
  // also what keeps the stats consistent with the planned tasks
  @transient private lazy val latestSnapshot: Map[Int, Long] =
    GraftLog.latestOffsets(path, conf)
  // broadcast ONCE per query (Spark's own sources' shape) — never the
  // whole conf inside every task's serialized closure
  private val confBc = org.apache.spark.sql.graft.Shim.broadcastConf(
    org.apache.spark.sql.SparkSession.active.sparkContext, conf)

  override def description(): String =
    s"graftlog(`$path`) PushedFilters: [${pushedDesc.mkString(", ")}], " +
      s"ReadSchema: ${required.fieldNames.mkString(",")}"

  // window semantics documented once, on GraftLogScan.batchWindow
  private def batchWindow(latest: Map[Int, Long]): (Map[Int, Long], Map[Int, Long]) =
    GraftLogScan.batchWindow(options, latest)

  /** EXACT row count (offsets are dense — the window width IS the
    * count) and a byte estimate pro-rated by each overlapping file's
    * covered offset fraction and the projected-column fraction (decode
    * pruning makes a narrow projection physically cheaper). Feeding
    * these to Catalyst is what lets a small log side auto-broadcast in
    * joins instead of shuffling the big side — at 100 TB the difference
    * between a dimension probe and a full exchange. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val latest = latestSnapshot
    val (start, end) = batchWindow(latest)
    val dirs = GraftLog.partitionDirs(path, conf)
    var rows = 0L
    var bytes = 0.0
    end.foreach { case (p, until0) =>
      val (from, until) = bounds.narrow(start.getOrElse(p, 0L), until0)
      if (until > from && bounds.keeps(p)) {
        rows += until - from
        dirs.get(p).foreach { d =>
          GraftLog.fileOffsetRanges(d, conf).foreach { e =>
            if (e.overlaps(from, until)) {
              val frac =
                if (!e.complete || e.statsMax < e.statsMin) 1.0
                else {
                  val covered = math.min(until - 1, e.statsMax) -
                    math.max(from, e.statsMin) + 1
                  covered.toDouble / (e.statsMax - e.statsMin + 1)
                }
              bytes += e.len * math.max(0.0, math.min(1.0, frac))
            }
          }
        }
      }
    }
    val colFrac = required.size.toDouble / GraftLog.Schema.size
    val sizeEst = math.max(1L, (bytes * colFrac).toLong)
    val nRows = rows
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(sizeEst)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(nRows)
    }
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val latest = latestSnapshot
      val (start, end) = batchWindow(latest)
      val planned = GraftLogScan.plan(path, conf, start, end, effectiveBounds,
        GraftLogScan.minSplitsOption(options))
      limitOpt.fold(planned)(GraftLogScan.truncateToLimit(planned, _))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory(required, confBc)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(path, options, required, bounds, confBc)
}

object GraftLogScan {
  /** The batch read window from the options (defaults: whole log).
    * Out-of-range positions follow `failOnDataLoss` like the streaming
    * path (kafka/Consumer.java:548-590's recovery): requesting offsets
    * past a partition's end means the log was truncated or rewritten
    * under the reader — fail loudly by default, clamp and warn when the
    * caller opted out. A silent empty window would make a bounded
    * replay "succeed" while draining nothing. Shared by the row scan
    * and the pushed-aggregate scan. */
  private[sources] def batchWindow(options: Map[String, String],
      latest: Map[Int, Long]): (Map[Int, Long], Map[Int, Long]) = {
    val failOnDataLoss =
      options.getOrElse("failondataloss", "true").toBoolean
    lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
    def clampOrFail(which: String, p: Int, o: Long): Long = {
      val lat = latest.getOrElse(p, 0L)
      if (o <= lat) o
      else if (failOnDataLoss) throw new IllegalStateException(
        s"$which $o out of range for partition $p (latest $lat)")
      else {
        log.warn(s"[graftlog] partition $p $which $o out of range; " +
          s"clamping to $lat")
        lat
      }
    }
    val start = options.get("startingoffsets") match {
      case None | Some("earliest") => latest.map { case (p, _) => p -> 0L }
      case Some("latest") => throw new IllegalArgumentException(
        "startingOffsets=latest is streaming-only; a batch read needs " +
          "'earliest' or an explicit JSON offset map")
      case Some(json) =>
        val m = GraftLog.offsetsFromJson(json)
        // Explicit entries for partitions absent from the log mean the
        // log was truncated or rewritten under the caller — exactly the
        // silent-empty-window shape this function must fail loudly on.
        // Route them through the same failOnDataLoss policy as an
        // out-of-range offset instead of silently dropping them.
        m.keysIterator.filterNot(latest.contains).foreach { p =>
          if (failOnDataLoss) throw new IllegalStateException(
            s"startingOffsets names partition $p which does not exist " +
              s"in the log (partitions: ${latest.keys.toSeq.sorted.mkString(",")}); " +
              "the log was truncated or rewritten. Set failOnDataLoss=false " +
              "to skip vanished partitions.")
          else log.warn(s"[graftlog] startingOffsets partition $p absent " +
            "from the log; skipping (failOnDataLoss=false)")
        }
        latest.map { case (p, _) =>
          p -> m.get(p).map(clampOrFail("startingOffsets", p, _)).getOrElse(0L)
        }
    }
    val end = options.get("endingoffsets") match {
      case None | Some("latest") => latest
      case Some("earliest") => throw new IllegalArgumentException(
        "endingOffsets=earliest is not a valid batch bound; use 'latest' " +
          "or an explicit JSON offset map")
      case Some(json) =>
        GraftLog.offsetsFromJson(json).map { case (p, e) =>
          p -> clampOrFail("endingOffsets", p, e)
        }
    }
    (start, end)
  }

  /** Truncate planned tasks to a pushed LIMIT: cumulative window widths
    * up to `n`, the crossing task narrowed, the rest dropped — a
    * `LIMIT 10` over a huge log plans one sliver of one partition. */
  private[sources] def truncateToLimit(
      parts: Array[InputPartition], n: Int): Array[InputPartition] = {
    var remaining = n.toLong
    val out = Array.newBuilder[InputPartition]
    parts.foreach {
      case g: GraftLogInputPartition if remaining > 0 =>
        val width = g.until - g.from
        if (width <= remaining) { out += g; remaining -= width }
        else {
          out += GraftLogInputPartition(g.partition, g.from,
            g.from + remaining, g.files)
          remaining = 0
        }
      case _ => ()
    }
    out.result()
  }

  /** Validated `minPartitions` hint (Kafka-source option name, lower-
    * cased by [[CaseInsensitiveStringMap]]): a non-numeric or
    * non-positive value fails loudly AT PLANNING TIME — a silently
    * ignored `minpartitions=0` would read as "no splitting" and mask a
    * config typo forever (the Kafka connector rejects it the same way). */
  private[sources] def minSplitsOption(options: Map[String, String]): Int =
    options.get("minpartitions").map { s =>
      val n = try s.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graftlog option minPartitions must be a positive integer, got '$s'")
      }
      if (n <= 0) throw new IllegalArgumentException(
        s"graftlog option minPartitions must be a positive integer, got '$s'")
      n
    }.getOrElse(1)

  /** assign + seek: one InputPartition per log partition, bounded
    * [start, end) then narrowed by any pushed bounds; partitions with
    * no backlog (or pruned by a pushed partition predicate) plan
    * nothing, and within a partition only the FILES whose footer
    * [min, max] offset envelope overlaps the range ship to the task —
    * without this, every micro-batch re-decodes the whole partition
    * and draining a backlog is O(n²) in the log size.
    *
    * `minSplits` (the Kafka source's `minPartitions` option): when the
    * planned task count is below it, partition ranges are SPLIT into
    * offset sub-ranges proportionally to backlog — without this, read
    * parallelism is capped at #log-partitions and one hot partition's
    * drain runs on one core however large the cluster. Each sub-range
    * re-prunes its file list against the footer envelopes, so the extra
    * tasks read slices, not copies. */
  private[sources] def plan(path: String, conf: Configuration,
      start: Map[Int, Long], end: Map[Int, Long],
      bounds: GraftLogBounds = GraftLogBounds.All,
      minSplits: Int = 1): Array[InputPartition] = {
    // listing + footer sweep under the maintenance seqlock: a plan
    // assembled inside a compaction swap or TRUNCATE window would
    // silently drop rows (see validatedListing)
    val base = GraftLog.validatedListing(path, conf, "scan planning") {
      val dirs = GraftLog.partitionDirs(path, conf)
      end.toSeq.sortBy(_._1).flatMap { case (p, until0) =>
        val (from, until) = bounds.narrow(start.getOrElse(p, 0L), until0)
        if (until <= from || !bounds.keeps(p)) None
        else dirs.get(p).flatMap { d =>
          val envs = GraftLog.fileOffsetRanges(d, conf)
            .filter(_.overlaps(from, until))
          if (envs.isEmpty) None else Some((p, from, until, envs))
        }
      }
    }
    val splits = splitCounts(base.map(t => t._3 - t._2), minSplits)
    base.zip(splits).flatMap { case ((p, from, until, envs), k) =>
      if (k <= 1) Seq(GraftLogInputPartition(p, from, until,
        envs.map(_.file).toArray))
      else {
        val n = until - from
        (0 until k).flatMap { i =>
          // near-even long-math boundaries: from + i*n/k
          val f = from + i.toLong * n / k
          val u = from + (i + 1).toLong * n / k
          val files = envs.filter(_.overlaps(f, u)).map(_.file)
          if (u <= f || files.isEmpty) None
          else Some(GraftLogInputPartition(p, f, u, files.toArray))
        }
      }
    }.toArray
  }

  /** Split allocation: proportional to backlog (floor, remainder to
    * ascending partitions that can still split — deterministic), every
    * planned partition gets >= 1, no partition splits finer than one
    * offset per task. The total NEVER exceeds `minSplits` (nor
    * Σ backlog): tiny backlogs may cap it below the hint, and when the
    * per-partition >=1 floors alone overshoot (many near-empty
    * partitions beside one hot one), the excess is taken back from the
    * LARGEST allocations so the hot partition gives up parallelism
    * last. */
  private[sources] def splitCounts(backlogs: Seq[Long], minSplits: Int): Seq[Int] = {
    val n = backlogs.length
    if (n == 0 || minSplits <= n) Seq.fill(n)(1)
    else {
      val total = backlogs.sum.toDouble
      if (total <= 0) Seq.fill(n)(1)
      else {
        val raw = backlogs.map(b => math.max(1, math.min(b,
          math.floor(b * minSplits / total).toLong)).toInt).toArray
        var rem = minSplits - raw.sum
        var i = 0
        while (rem > 0 && i < n) {
          if (raw(i) < backlogs(i)) { raw(i) += 1; rem -= 1 }
          i += 1
        }
        // rem < 0: the max(1, ..) floors overshot the hint — claw the
        // excess back from the largest allocations (ties to the lowest
        // index — deterministic), never below 1 per partition
        while (rem < 0) {
          var best = -1
          var j = 0
          while (j < n) {
            if (raw(j) > 1 && (best < 0 || raw(j) > raw(best))) best = j
            j += 1
          }
          if (best < 0) rem = 0 else { raw(best) -= 1; rem += 1 }
        }
        raw.toSeq
      }
    }
  }
}

final case class GraftLogInputPartition(
    partition: Int, from: Long, until: Long, files: Array[String])
  extends InputPartition

/** COMPLETE-pushdown aggregate scan: COUNT(*) / MIN(offset) /
  * MAX(offset) answered from footer statistics at PLANNING — offsets
  * are dense per partition, so the planned window width IS the exact
  * count and the window edges ARE the exact extrema. The single task
  * materializes the precomputed row; no data page is ever read. The
  * builder only routes here when every data filter was pushed exactly
  * (a residual would falsify the metadata answer) and there is no
  * grouping. */
final class GraftLogAggScan(path: String, options: Map[String, String],
    bounds: GraftLogBounds, kinds: Seq[String],
    pushedDesc: Array[String]) extends Scan {
  private val conf = GraftLog.sessionConf()

  override def readSchema(): StructType = StructType(kinds.map {
    case "count" => StructField("count(*)", LongType, nullable = false)
    case "min_offset" => StructField("min(offset)", LongType)
    case other => StructField("max(offset)", LongType)
  })

  override def description(): String =
    s"graftlog(`$path`) PushedAggregates: [${kinds.mkString(", ")}], " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}]"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val latest = GraftLog.latestOffsets(path, conf)
      val (start, end) = GraftLogScan.batchWindow(options, latest)
      var count = 0L
      var mn = Option.empty[Long]
      var mx = Option.empty[Long]
      end.foreach { case (p, until0) =>
        val (from, until) = bounds.narrow(start.getOrElse(p, 0L), until0)
        if (until > from && bounds.keeps(p)) {
          count += until - from
          mn = Some(mn.fold(from)(math.min(_, from)))
          mx = Some(mx.fold(until - 1)(math.max(_, until - 1)))
        }
      }
      val values: Array[java.lang.Long] = kinds.map {
        case "count" => java.lang.Long.valueOf(count)
        case "min_offset" => mn.map(java.lang.Long.valueOf).orNull
        case _ => mx.map(java.lang.Long.valueOf).orNull
      }.toArray
      Array(GraftLogAggResult(values))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogAggReaderFactory
  }
}

final case class GraftLogAggResult(values: Array[java.lang.Long])
  extends InputPartition

final class GraftLogAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val vs = p.asInstanceOf[GraftLogAggResult].values
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(vs.map[Any](v =>
          if (v == null) null else v.longValue()))
      override def close(): Unit = ()
    }
  }
}

/** [[GroupReadSupport]] that prunes the requested read schema BY NAME
  * against each file's OWN schema — decode-level column pruning. Parquet
  * then reads/decompresses/decodes ONLY the kept columns' pages; a
  * 2-column projection never touches the payload column chunks. Pruning
  * against the file schema (not a hand-built MessageType) keeps the
  * repetition/type of every kept field exactly the file's, so schema
  * compatibility holds for any writer. */
final class ProjectedGroupReadSupport(keep: Array[String])
    extends GroupReadSupport {
  override def init(context: InitContext): ReadSupport.ReadContext = {
    val file = context.getFileSchema
    val kept = keep.filter(file.containsField)
      .map(n => file.getType(file.getFieldIndex(n)))
    new ReadSupport.ReadContext(new MessageType(file.getName, kept: _*))
  }
}

/** [[org.apache.parquet.io.SeekableInputStream]] wrapper that counts
  * bytes PHYSICALLY fetched from storage — the measurement behind the
  * suite's decode-pruning assertions and the connector's `bytesFetched`
  * task metric. (Hadoop's own `FileSystem.Statistics` misses the
  * ByteBuffer/positioned read paths parquet uses on local files, so the
  * connector counts at the stream it actually reads.) */
private final class CountingStream(
    d: org.apache.parquet.io.SeekableInputStream,
    c: java.util.concurrent.atomic.LongAdder)
  extends org.apache.parquet.io.DelegatingSeekableInputStream(d) {
  override def getPos: Long = d.getPos
  override def seek(p: Long): Unit = d.seek(p)
  private def counted(n: Int): Int = { if (n > 0) c.add(n.toLong); n }
  override def read(): Int = { val b = d.read(); if (b >= 0) c.add(1L); b }
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    counted(d.read(b, off, len))
  override def read(buf: java.nio.ByteBuffer): Int = counted(d.read(buf))
  override def readFully(b: Array[Byte]): Unit = {
    d.readFully(b); c.add(b.length.toLong)
  }
  override def readFully(b: Array[Byte], off: Int, len: Int): Unit = {
    d.readFully(b, off, len); c.add(len.toLong)
  }
  override def readFully(buf: java.nio.ByteBuffer): Unit = {
    val n = buf.remaining(); d.readFully(buf); c.add(n.toLong)
  }
}

private final class CountingInputFile(
    d: org.apache.parquet.io.InputFile,
    c: java.util.concurrent.atomic.LongAdder)
  extends org.apache.parquet.io.InputFile {
  override def getLength: Long = d.getLength
  override def newStream(): org.apache.parquet.io.SeekableInputStream =
    new CountingStream(d.newStream(), c)
}

object GraftLogReaderFactory {
  /** Bytes the connector's readers physically fetched in this JVM —
    * per-executor counter; the suite asserts pruned reads fetch less. */
  val bytesFetched = new java.util.concurrent.atomic.LongAdder

  /** The InputFile-based builder face (the Path face can't take a
    * wrapped stream). */
  private[sources] final class GroupBuilder(
      in: org.apache.parquet.io.InputFile,
      rs: ReadSupport[org.apache.parquet.example.data.Group])
    extends ParquetReader.Builder[org.apache.parquet.example.data.Group](in) {
    override def getReadSupport(): ReadSupport[org.apache.parquet.example.data.Group] = rs
  }
}

final class GraftLogReaderFactory(required: StructType = GraftLog.Schema,
    confBc: org.apache.spark.sql.graft.ConfBroadcast = null,
    // TEST SEAM: a private counter isolates byte measurements from any
    // concurrent graftlog reader in the JVM (the global LongAdder is a
    // process-wide metric). @transient — an executor-side deserialized
    // factory always falls back to its OWN JVM's per-executor counter.
    @transient counterOverride: java.util.concurrent.atomic.LongAdder = null)
  extends PartitionReaderFactory {
  private def counter: java.util.concurrent.atomic.LongAdder =
    if (counterOverride != null) counterOverride
    else GraftLogReaderFactory.bytesFetched

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftLogInputPartition]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      // executor side: the DRIVER's Hadoop conf via broadcast
      // (credentials, fs impls) — a bare new Configuration() drops it
      private val conf =
        if (confBc == null) new Configuration() else confBc.value
      // physical columns to DECODE: the requested fields minus the
      // virtual `partition` (a directory, not a column), plus `offset`
      // always — the range predicate needs it even when unprojected
      private val physical: Array[String] = {
        val want = fields.filter(_ != "partition")
        if (want.contains("offset")) want else "offset" +: want
      }
      // the task's [from, until) pushed into parquet itself: row-group
      // statistics (and column/offset indexes) SKIP whole groups outside
      // the range — a tail-slice read of a multi-row-group segment costs
      // its slice, not the segment — and record-level filtering drops
      // the rest before assembly
      private val rangeFilter = FilterCompat.get(FilterApi.and(
        FilterApi.gtEq(FilterApi.longColumn("offset"),
          java.lang.Long.valueOf(gp.from)),
        FilterApi.lt(FilterApi.longColumn("offset"),
          java.lang.Long.valueOf(gp.until))))
      private var fileIdx = 0
      private var reader: ParquetReader[org.apache.parquet.example.data.Group] = _
      private var row: InternalRow = _

      private def nextReader(): Boolean = {
        if (reader != null) { reader.close(); reader = null }
        if (fileIdx >= gp.files.length) false
        else {
          val in = new CountingInputFile(
            HadoopInputFile.fromPath(new Path(gp.files(fileIdx)), conf),
            counter)
          reader = new GraftLogReaderFactory.GroupBuilder(
              in, new ProjectedGroupReadSupport(physical))
            .withConf(conf).withFilter(rangeFilter).build()
          fileIdx += 1
          true
        }
      }

      override def next(): Boolean = {
        while (true) {
          if (reader == null && !nextReader()) return false
          val g = reader.read()
          if (g == null) { reader.close(); reader = null }
          else {
            val off = g.getLong("offset", 0)
            // defense-in-depth re-check of the pushed range (a stats-less
            // writer can defeat group-level skipping, never correctness)
            if (off >= gp.from && off < gp.until) {
              def str(f: String): UTF8String =
                if (g.getFieldRepetitionCount(f) == 0) null
                else UTF8String.fromString(g.getString(f, 0))
              // only the pruned schema's fields are emitted, in its order
              row = new GenericInternalRow(fields.map[Any] {
                case "partition" => gp.partition
                case "offset" => off
                case f => str(f)
              })
              return true
            }
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}

final class GraftLogMicroBatchStream(path: String, options: Map[String, String],
    required: StructType = GraftLog.Schema,
    bounds: GraftLogBounds = GraftLogBounds.All,
    confBc: org.apache.spark.sql.graft.ConfBroadcast = null)
  extends MicroBatchStream with SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val conf =
    if (confBc == null) GraftLog.sessionConf() else confBc.value
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Trigger.AvailableNow contract: pin the end positions ONCE at query
    * start; every batch then drains toward that fixed end under the
    * same admission limits (without this, Spark falls back to a single
    * unlimited batch and the rate shaping is silently ignored). */
  @volatile private var availableNowEnd: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(GraftLog.latestOffsets(path, conf))

  private def currentEnd(): Map[Int, Long] =
    availableNowEnd.getOrElse(GraftLog.latestOffsets(path, conf))
  private val failOnDataLoss =
    options.getOrElse("failondataloss", "true").toBoolean

  /** Kafka-source convention: `maxOffsetsPerTrigger` caps a batch,
    * `minOffsetsPerTrigger` defers one until the backlog is worth a
    * trigger (small-batch suppression for slow logs), with
    * `maxTriggerDelayMs` bounding how long the gate may hold (default
    * 15 min — Kafka's maxTriggerDelay). Both set → a composite limit. */
  override def getDefaultReadLimit: ReadLimit = {
    val max = options.get("maxoffsetspertrigger")
      .map(n => ReadLimit.maxRows(n.toLong))
    val min = options.get("minoffsetspertrigger").map { n =>
      val delayMs = options.get("maxtriggerdelayms").map(_.toLong)
        .getOrElse(15L * 60 * 1000)
      ReadLimit.minRows(n.toLong, delayMs)
    }
    (min, max) match {
      case (Some(a), Some(b)) => ReadLimit.compositeLimit(Array[ReadLimit](a, b))
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case _ => ReadLimit.allAvailable()
    }
  }

  /** The log's `_maint/INC` TRUNCATE counter — one small-file read,
    * checked at every admission and plan (r20). */
  private def currentIncarnation(): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    GraftLogMaintenance.incarnation(p.getFileSystem(conf), path)
  }

  private def incarnationMismatch(checkpointed: Long, cur: Long): Nothing =
    throw new IllegalStateException(
      s"checkpointed log incarnation $checkpointed != current $cur for $path: " +
        "the log was truncated or rewritten under this checkpoint (a new " +
        "incarnation reusing the old offset space — no consistent redelivery " +
        "exists, regardless of relative offsets). Start the query with a " +
        "NEW checkpoint location.")

  override def initialOffset(): Offset = {
    val latest = GraftLog.latestOffsets(path, conf)
    val start = options.get("startingoffsets") match {
      case None | Some("earliest") => latest.map { case (p, _) => p -> 0L }
      case Some("latest") => latest
      case Some(json) =>
        val want = GraftLog.offsetsFromJson(json)
        // out-of-range recovery (kafka/Consumer.java:548-590): a seek
        // past the log end either fails loudly or clamps to the end
        want.map { case (p, o) =>
          val lat = latest.getOrElse(p, 0L)
          if (o > lat) {
            if (failOnDataLoss)
              throw new IllegalStateException(
                s"startingOffsets $o out of range for partition $p (latest $lat)")
            log.warn(
              s"[graftlog] partition $p start $o out of range; clamping to $lat")
            p -> lat
          } else p -> o
        } ++ (latest.keySet -- want.keySet).map(p => p -> 0L)
    }
    GraftLogOffset(start, currentIncarnation())
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  // when the min-rows gate last let a batch through — the reference
  // point for maxTriggerDelayMs (the Kafka source's lastTriggerMillis)
  @volatile private var lastTriggerMs: Long = System.currentTimeMillis()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftLogOffset].offsets
    // incarnation stamp FIRST (r20): catches a TRUNCATE even after the
    // replacement log has grown past the committed offsets — the timing
    // the offset-regression check below cannot see. A legacy checkpoint
    // (stamp -1) falls through to the offset checks and is stamped with
    // the current incarnation on its next committed batch.
    val startInc = start.asInstanceOf[GraftLogOffset].incarnation
    val curInc = currentIncarnation()
    if (startInc >= 0 && startInc != curInc)
      incarnationMismatch(startInc, curInc)
    val latest0 = currentEnd()
    // TRUNCATE detection (r19, closing the streaming half of the
    // truncate contract at GraftLogCatalog.truncateTable): committed
    // positions PAST the log end mean the log restarted at offset 0
    // under this checkpoint — a new incarnation. Without this check the
    // max(0, ...) backlog silently STALLS the stream, and once the new
    // incarnation grows past the committed position it silently
    // delivers MIXED incarnations (new rows below the old watermark
    // never redelivered). ALWAYS a hard error — deliberately NOT
    // demoted by failOnDataLoss: the new incarnation reuses the old
    // offset space, so a stale checkpoint cannot redeliver it
    // consistently under exactly-once (offset 0 is already "committed"
    // there); failOnDataLoss governs FORWARD loss only. The only sound
    // recovery is a fresh checkpoint, and the error says so.
    val regressed = from.filter { case (p, o) => latest0.getOrElse(p, 0L) < o }
    if (regressed.nonEmpty)
      throw new IllegalStateException(
        s"committed offsets ${regressed.toSeq.sorted.mkString(", ")} are past " +
          s"the log end ${latest0.toSeq.sorted.mkString(", ")}: the log was " +
          "truncated or rewritten under this checkpoint (a new incarnation " +
          "reusing the old offset space — no consistent redelivery exists). " +
          "Start the query with a NEW checkpoint location.")
    val latest = latest0
    val backlog = latest.map { case (p, l) =>
      p -> math.max(0L, l - from.getOrElse(p, 0L))
    }
    val total = backlog.values.sum
    val limits = limit match {
      case c: CompositeReadLimit => c.getReadLimits.toSeq
      case l => Seq(l)
    }
    // min gate: defer a sub-threshold batch — unless the delay bound
    // expired, or the query is DRAINING (AvailableNow pins an end and
    // must reach it; Kafka ignores minOffsets there too)
    val gateHolds = limits.collectFirst { case m: ReadMinRows => m }.exists { m =>
      availableNowEnd.isEmpty && total < m.minRows() &&
        System.currentTimeMillis() - lastTriggerMs < m.maxTriggerDelayMs()
    }
    if (gateHolds) GraftLogOffset(from, curInc) // no progress = no batch this trigger
    else {
      lastTriggerMs = System.currentTimeMillis()
      limits.collectFirst { case r: ReadMaxRows => r } match {
        case Some(r) if total > r.maxRows() =>
          // split the row budget over partition backlogs PROPORTIONALLY
          // (the Kafka-source rule), remainder to ascending partition
          // ids — deterministic, and a starved partition always
          // progresses when the budget allows
          val cap = r.maxRows()
          val base = backlog.map { case (p, b) => p -> (b * cap / total) }
          var rem = cap - base.values.sum
          val takes = backlog.keys.toSeq.sorted.map { p =>
            val extra = if (rem > 0 && base(p) < backlog(p)) { rem -= 1; 1L } else 0L
            p -> math.min(backlog(p), base(p) + extra)
          }.toMap
          GraftLogOffset(latest.map { case (p, _) =>
            p -> (from.getOrElse(p, 0L) + takes.getOrElse(p, 0L))
          }, curInc)
        case _ => GraftLogOffset(latest, curInc) // all-available / under the cap
      }
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val (m, inc) = GraftLog.offsetsAndIncFromJson(json)
    GraftLogOffset(m, inc)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftLogOffset].offsets
    val until = end.asInstanceOf[GraftLogOffset].offsets
    // incarnation stamp at plan time too (r20): catches a restart whose
    // FIRST call replans a checkpoint-reconstructed batch, and a
    // TRUNCATE landing between admission and planning
    val planInc = end.asInstanceOf[GraftLogOffset].incarnation
    if (planInc >= 0) {
      val cur = currentIncarnation()
      if (planInc != cur) incarnationMismatch(planInc, cur)
    }
    // an INVERTED window (checkpointed start past the batch end) is the
    // truncation signature at plan time — GraftLogScan.plan would
    // otherwise skip those partitions SILENTLY (until <= from yields no
    // ranges), turning a new log incarnation into a quiet stall and,
    // once it grows, mixed delivery. Hard like latestOffset's check
    // (belt and braces: this one also catches a truncation landing
    // between admission and planning, and a restart whose FIRST call is
    // a plan of a checkpoint-reconstructed batch)
    val inverted = from.filter { case (p, o) => until.getOrElse(p, o) < o }
    if (inverted.nonEmpty)
      throw new IllegalStateException(
        s"microbatch start ${inverted.toSeq.sorted.mkString(", ")} is past its " +
          s"end ${until.toSeq.sorted.mkString(", ")}: the log was truncated or " +
          "rewritten under this checkpoint (a new incarnation reusing the old " +
          "offset space — no consistent redelivery exists). Start the query " +
          "with a NEW checkpoint location.")
    // the Scan's pushed bounds apply here too — the claimed-exact
    // pushdown contract must hold if Spark ever pushes into streaming
    // relations (today it does not; offsets still advance for pruned
    // partitions, whose rows the bounds exclude by construction)
    GraftLogScan.plan(path, conf, from, until, bounds,
      GraftLogScan.minSplitsOption(options))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(required, confBc)

  override def commit(end: Offset): Unit = () // positions live in the checkpoint
  override def stop(): Unit = ()
}
