package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/**
 * NATIVE V2 write path for the partitioned offset log — the emit side
 * (reference DynamicSpout.java:249-255) at the level Spark models
 * sinks: `df.write.format("graftlog")` appends a batch,
 * `df.writeStream.format("graftlog")` is an exactly-once streaming
 * sink. Both ride [[RequiresDistributionAndOrdering]]: Spark clusters
 * the input by log partition and sorts it before any writer runs, so
 * each task owns whole partitions, assigns dense offsets task-locally
 * (base from parquet FOOTER stats + running rank — no driver round
 * trip, no global coordination), and emits ONE segment file per
 * partition per batch ([[GraftLog.append]]'s all-or-nothing unit).
 *
 * Commit protocol: tasks stage under `_staging/<queryId>/<epochId>/`
 * (invisible — underscore-prefixed), the driver RENAMES staged
 * segments into their partition directories at commit. Streaming
 * commits are idempotent through the [[GraftLog.appendBatch]] marker
 * namespace: `_producer/<epochId>.intent` pins the first attempt's
 * bases, an epoch replay renames only partitions still AT their base
 * (an advanced one committed on a prior attempt), and
 * `_producer/<epochId>` short-circuits a fully-committed replay —
 * the ExactlyOnceSinkSuite orderings, native.
 *
 * Offset modes (`option("offsets", ...)`):
 *  - `assign` — the producer face: the input's `offset` column is
 *    ignored (pass -1); offsets are assigned base+rank under
 *    (key, value) ordering, [[GraftLog.append]]'s rule.
 *  - `provided` (default) — the materialize face: rows carry explicit
 *    offsets; the writer REQUIRES them dense from each partition's
 *    current end and fails loudly on a gap or overlap (a silent gap
 *    would freeze [[GraftLog.latestOffsets]] positions forever).
 *    STREAMING writers relax the low side only: on an epoch replay a
 *    partition committed by the prior attempt has already advanced the
 *    footer end past the replayed rows' offsets, so rows BELOW the
 *    task's base are skipped as already-durable (they are, verbatim —
 *    provided offsets are content-addressed by position) and density
 *    is required from the first new offset. Batch writers stay strict:
 *    a batch row below the end is caller error, not a replay.
 *
 * Single producer per log (the marker-namespace stance, shared with
 * the foreachBatch faces). 100 TB shape: commit cost is one rename +
 * two metadata RPCs per partition touched — nothing row-proportional;
 * rows stream through task-local parquet writers at full parallelism.
 */
final class GraftLogWriteBuilder(path: String, info: LogicalWriteInfo)
  extends WriteBuilder {

  override def build(): Write = {
    val cols = info.schema().fieldNames.map(_.toLowerCase)
    require(Seq("partition", "key", "value").forall(cols.contains),
      s"graftlog write needs partition/key/value columns, got ${cols.mkString(",")}")
    val assign = info.options.getOrDefault("offsets", "provided") match {
      case "assign" => true
      case "provided" =>
        require(cols.contains("offset"),
          "offsets=provided (the default) needs an offset column; " +
            "pass option(\"offsets\", \"assign\") to have the log assign them")
        false
      case other => throw new IllegalArgumentException(
        s"graftlog option offsets must be 'assign' or 'provided', got '$other'")
    }
    new GraftLogWrite(path, info.queryId(), info.schema(), assign)
  }
}

final class GraftLogWrite(path: String, queryId: String,
    schema: StructType, assign: Boolean)
  extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("partition")))

  /** Within each task: partitions contiguous, rows in offset order —
    * either the explicit one (provided) or the (key, value) assignment
    * order ([[GraftLog.append]]'s deterministic intra-batch rule). */
  override def requiredOrdering(): Array[SortOrder] = {
    val tail = if (assign) Seq("key", "value") else Seq("offset")
    ("partition" +: tail).map(c =>
      Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING)).toArray
  }

  private def confBc = org.apache.spark.sql.graft.Shim.broadcastConf(
    org.apache.spark.sql.SparkSession.active.sparkContext,
    GraftLog.sessionConf())

  override def toBatch: BatchWrite = new GraftLogBatchWrite(
    path, s"$path/_staging/$queryId/batch", schema, assign, confBc)

  override def toStreaming: StreamingWrite = new GraftLogStreamingWrite(
    path, s"$path/_staging/$queryId", queryId, schema, assign, confBc)
}

/** (log partition, staged file, base the task read, rows staged). */
final case class GraftLogCommitMessage(
    entries: Seq[(Int, String, Long, Long)]) extends WriterCommitMessage

object GraftLogWrite {
  private[sources] def fs(p: String, conf: Configuration): FileSystem =
    new Path(p).getFileSystem(conf)

  /** Flatten task messages; a batch's entries must be one-per-partition
    * (the clustered distribution guarantees it — violation means the
    * planner broke the contract, fail loudly before corrupting the
    * log). */
  private[sources] def entriesOf(
      messages: Array[WriterCommitMessage]): Seq[(Int, String, Long, Long)] = {
    val entries = messages.toSeq.collect {
      case GraftLogCommitMessage(es) => es
    }.flatten
    val dup = entries.groupBy(_._1).filter(_._2.length > 1).keys
    require(dup.isEmpty,
      s"multiple staged segments for log partition(s) ${dup.mkString(",")} — " +
        "the clustered write distribution was not honored")
    entries
  }

  /** Rename a staged segment into its partition directory. */
  private[sources] def promote(dir: String, conf: Configuration,
      p: Int, staged: String): Unit = {
    val f = fs(dir, conf)
    val dest = new Path(dir, s"partition=$p/${new Path(staged).getName}")
    f.mkdirs(dest.getParent)
    require(f.rename(new Path(staged), dest),
      s"failed to promote staged segment $staged to $dest")
  }

  private[sources] def deleteDir(root: String, conf: Configuration): Unit = {
    val f = fs(root, conf)
    val p = new Path(root)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Drop a finished staging dir and any now-empty ancestors up to and
    * including the `_staging` root (all underscore-invisible — this is
    * tidiness, not correctness). */
  private[sources] def cleanupStaging(stagingDir: String, conf: Configuration): Unit = {
    deleteDir(stagingDir, conf)
    val f = fs(stagingDir, conf)
    var p = new Path(stagingDir).getParent
    var continue = true
    while (continue && p != null) {
      val atRoot = p.getName == "_staging"
      if (f.exists(p) && f.listStatus(p).isEmpty) { f.delete(p, false); () }
      else continue = false
      if (atRoot) continue = false
      p = p.getParent
    }
  }
}

/** Batch append: stage, verify bases unmoved (single-writer sanity),
  * promote. A crash between promotes tears at a partition boundary —
  * the same tear [[GraftLog.append]] documents; batch retries go
  * through [[GraftLog.appendBatch]] or the streaming face when
  * idempotence is needed. */
final class GraftLogBatchWrite(dir: String, stagingDir: String,
    schema: StructType, assign: Boolean,
    confBc: org.apache.spark.sql.graft.ConfBroadcast)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftLogWriterFactory(dir, stagingDir, schema, assign, confBc)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = confBc.value
    val entries = GraftLogWrite.entriesOf(messages)
    val current = GraftLog.latestOffsets(dir, conf)
    entries.foreach { case (p, _, base, _) =>
      require(current.getOrElse(p, 0L) == base,
        s"log $dir partition $p advanced past the staged base $base " +
          s"(now ${current.getOrElse(p, 0L)}) — concurrent producer?")
    }
    entries.foreach { case (p, staged, _, _) =>
      GraftLogWrite.promote(dir, conf, p, staged)
    }
    GraftLogWrite.cleanupStaging(stagingDir, conf)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftLogWrite.cleanupStaging(stagingDir, confBc.value)
}

/** Streaming sink: the [[GraftLog.appendBatch]] idempotence protocol
  * at the V2 commit hook — epoch replays skip committed partitions and
  * a done epoch outright. The marker namespace is scoped by the
  * STREAMING QUERY id (stable across restarts of one checkpoint, fresh
  * for a recreated one — exactly the producer-incarnation boundary the
  * [[ProducerMarkers]] scope exists for). */
final class GraftLogStreamingWrite(dir: String, stagingRoot: String,
    queryId: String, schema: StructType, assign: Boolean,
    confBc: org.apache.spark.sql.graft.ConfBroadcast)
  extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftLogWriterFactory(dir, stagingRoot, schema, assign, confBc)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = confBc.value
    val markers = new ProducerMarkers(dir, queryId, conf)
    val epochStaging = s"$stagingRoot/$epochId"
    if (markers.done(epochId)) { // fully-committed replay
      GraftLogWrite.cleanupStaging(epochStaging, conf)
      return
    }
    val entries = GraftLogWrite.entriesOf(messages)
    val current = GraftLog.latestOffsets(dir, conf)
    val bases = markers.basesFor(epochId, current)
    entries.foreach { case (p, staged, taskBase, _) =>
      val b = bases.getOrElse(p, 0L)
      val cur = current.getOrElse(p, 0L)
      if (cur == b) {
        // still pending: the task staged from the same footer state
        require(taskBase == b,
          s"partition $p staged from base $taskBase but the epoch's " +
            s"first-attempt base is $b")
        GraftLogWrite.promote(dir, conf, p, staged)
      } else {
        // committed by a previous attempt of this epoch — skip, and the
        // single-writer invariant says nothing else can have moved it
        require(cur >= b,
          s"log $dir partition $p regressed below the epoch $epochId base " +
            s"($b -> $cur) — was the log rewritten underneath the producer?")
      }
    }
    markers.markDone(epochId) // the epoch's commit point
    GraftLogWrite.cleanupStaging(epochStaging, conf)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftLogWrite.cleanupStaging(s"$stagingRoot/$epochId", confBc.value)
}

/** One factory serves both faces; batch writers stage under
  * `<staging>/batch`, streaming writers under `<staging>/<epochId>`. */
final class GraftLogWriterFactory(dir: String, stagingRoot: String,
    schema: StructType, assign: Boolean,
    confBc: org.apache.spark.sql.graft.ConfBroadcast)
  extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(dir, stagingRoot, schema, assign, confBc.value, taskId,
      tolerateReplayed = false)

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(dir, s"$stagingRoot/$epochId", schema, assign,
      confBc.value, taskId,
      // provided-mode epoch replays carry offsets the prior attempt
      // already committed — tolerated (skipped) in streaming only
      tolerateReplayed = !assign)
}

/** Task-side writer: input arrives clustered by log partition and
  * sorted, so partitions are contiguous runs — on each boundary, read
  * the partition's end position from FOOTER stats, stream rows into
  * ONE staged parquet segment with dense offsets, and report
  * (partition, file, base, count) for the driver's commit. */
final class GraftLogDataWriter(dir: String, stagingDir: String,
    schema: StructType, assign: Boolean, baseConf: Configuration,
    taskId: Long, tolerateReplayed: Boolean = false)
  extends DataWriter[InternalRow] {

  // case-INSENSITIVE resolution: the builder validates names that way
  // (Spark's own resolution posture), so the writer must match — a
  // case-sensitive fieldIndex here would pass validation and then blow
  // up obscurely in every executor
  private def idx(name: String): Int = {
    val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    require(i >= 0, s"graftlog write input lacks column '$name' " +
      s"(schema: ${schema.fieldNames.mkString(",")})")
    i
  }
  private val partIdx = idx("partition")
  private val keyIdx = idx("key")
  private val valueIdx = idx("value")
  private val offsetIdx = if (assign) -1 else idx("offset")

  private val segmentSchema = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  required int64 offset;
      |  optional binary key (UTF8);
      |  optional binary value (UTF8);
      |}""".stripMargin)
  private val groups = new SimpleGroupFactory(segmentSchema)

  private var curPart = Int.MinValue
  private var writer: org.apache.parquet.hadoop.ParquetWriter[org.apache.parquet.example.data.Group] = _
  private var curFile: String = _
  private var base = 0L
  private var next = 0L
  private var staged = List.empty[(Int, String, Long, Long)]

  private def closeCurrent(): Unit = if (writer != null) {
    writer.close()
    if (next > base) staged ::= ((curPart, curFile, base, next - base))
    else {
      // every row for this partition was a replayed (already-durable)
      // one — don't stage an empty segment, just drop the file
      val f = GraftLogWrite.fs(curFile, baseConf)
      val pth = new Path(curFile)
      if (f.exists(pth)) { f.delete(pth, false); () }
    }
    writer = null
  }

  private def open(p: Int): Unit = {
    closeCurrent()
    curPart = p
    base = GraftLog.partitionEnd(dir, p, baseConf)
    next = base
    curFile = s"$stagingDir/seg-p$p-t$taskId-${java.util.UUID.randomUUID()}.parquet"
    // fresh conf per segment: GroupWriteSupport pins the schema on it
    writer = ExampleParquetWriter.builder(new Path(curFile))
      .withConf(new Configuration(baseConf))
      .withType(segmentSchema)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(partIdx), "null partition in graftlog write batch")
    val p = row.getInt(partIdx)
    if (p != curPart || writer == null) open(p)
    val off =
      if (assign) next
      else {
        require(!row.isNullAt(offsetIdx), "null offset with offsets=provided")
        val o = row.getLong(offsetIdx)
        // Streaming epoch replay: a partition the prior attempt
        // committed has a footer end PAST these rows' offsets, so the
        // base this task just read is ahead of them. Those rows are
        // already durable at exactly these positions — skip them and
        // require density from the first genuinely-new offset. (Batch
        // writers keep the strict check: there is no replay protocol
        // to make a low offset legitimate there.)
        if (tolerateReplayed && o < base) return
        require(o == next,
          s"offset $o breaks density for partition $p (expected $next) — " +
            "provided offsets must continue each partition's dense sequence")
        o
      }
    val g = groups.newGroup().append("offset", off)
    if (!row.isNullAt(keyIdx)) g.append("key", row.getUTF8String(keyIdx).toString)
    if (!row.isNullAt(valueIdx)) g.append("value", row.getUTF8String(valueIdx).toString)
    writer.write(g)
    next = off + 1
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    GraftLogCommitMessage(staged.reverse)
  }

  override def abort(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    val f = GraftLogWrite.fs(stagingDir, baseConf)
    (curFile :: staged.map(_._2)).filter(_ != null).foreach { file =>
      val p = new Path(file)
      if (f.exists(p)) f.delete(p, false)
    }
  }

  override def close(): Unit = if (writer != null) { writer.close(); writer = null }
}
