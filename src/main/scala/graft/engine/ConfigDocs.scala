package graft.engine

/**
 * Config-key documentation registry + markdown generator — the
 * reference's auto-generated README config tables
 * (documentation/ConfigDocumentation.java annotations rendered by
 * documentation/DocGenerator.java). One [[Entry]] per key that
 * [[GraftConfig]] consults; [[markdown]] renders the reference-style
 * table grouped by section, and [[main]] regenerates
 * `docs/CONFIGURATION.md`. `ConfigDocsSuite` keeps code and docs in
 * lockstep: every key literal read in GraftConfig.scala must have an
 * entry here (and vice versa), and the committed file must match the
 * renderer's output — the same drift guard the reference gets from
 * regenerating its README in the build.
 */
object ConfigDocs {

  final case class Entry(
      key: String,
      valueType: String,
      default: String,
      description: String,
      section: String,
      required: Boolean = false)

  /** Reference class-name aliases accepted alongside each preset are in
    * the description, not separate rows — they configure the same knob. */
  val entries: Seq[Entry] = Seq(
    // --- Retry (reference SpoutConfig "Failure handling") ---
    Entry("spout.retry_manager.class", "String", "exponential_backoff",
      "Retry policy for failed records: preset `exponential_backoff`, " +
        "`failed_tuples_first`, `never`, a reference " +
        "`...retry.*RetryManager` class-name alias, or any " +
        "`graft.retry.RetryPolicy` class with a no-arg constructor.",
      "Retry"),
    Entry("spout.retry_manager.retry_limit", "Int", "25",
      "Attempts before a record is routed to the permanently-failed " +
        "sink (-1 semantics not supported; use a large value).",
      "Retry"),
    Entry("spout.retry_manager.initial_delay_ms", "Long", "1000",
      "Delay before the first retry of a failed record.", "Retry"),
    Entry("spout.retry_manager.delay_multiplier", "Double", "2.0",
      "Exponential backoff multiplier applied per subsequent failure.",
      "Retry"),
    Entry("spout.retry_manager.retry_delay_max_ms", "Long", "900000",
      "Upper bound on the computed backoff delay (15 min).", "Retry"),

    // --- Persistence (reference "Persistence" section) ---
    Entry("sideline.persistence.class", "String", "file",
      "Sideline-request control store: preset `file` (atomic " +
        "write-rename JSON docs under `sideline.persistence.dir`), " +
        "`memory` (tests), or any `graft.sideline.ControlStore` class.",
      "Persistence"),
    Entry("sideline.persistence.dir", "String", "—",
      "Directory backing the `file` control store. Required when " +
        "`sideline.persistence.class` is `file`.",
      "Persistence", required = true),

    // --- Coordinator / engine ---
    Entry("spout.coordinator.max_concurrent_virtual_spouts", "Int",
      QueryCoordinator.DefaultMaxConcurrent.toString,
      "Cap on concurrently running logical-source queries; excess " +
        "submissions queue until a slot frees (reference " +
        "SpoutCoordinator cap).",
      "Coordinator"),
    Entry("spout.coordinator.consumer_state_flush_interval_ms", "Long",
      "30000",
      "Checkpoint-commit cadence guidance for sinks that batch their " +
        "own offset state.",
      "Coordinator"),
    Entry("spout.spout_handler_class", "String", "noop",
      "Engine lifecycle hooks (open/close, query start/stop): preset " +
        "`noop`, the reference `NoopSpoutHandler` alias, or any " +
        "`graft.engine.EngineHooks` class. Legacy spelling " +
        "`spout.handler.class` is accepted as an alias.",
      "Coordinator"),
    Entry("spout.handler.class", "String", "—",
      "Deprecated alias for `spout.spout_handler_class`.", "Coordinator"),

    // --- Buffer / throttling ---
    Entry("buffer.rate_per_trigger", "Long", "10000",
      "Per-trigger row cap for unthrottled firehose queries " +
        "(`maxFilesPerTrigger`/`maxOffsetsPerTrigger` analogue).",
      "Buffer"),
    Entry("buffer.throttled_rate_per_trigger", "Long", "1000",
      "Per-trigger row cap applied to queries matching the throttle " +
        "regex (ThrottledMessageBuffer semantics).",
      "Buffer"),
    Entry("buffer.throttled_spout_id_regex", "Regex", "—",
      "Queries whose id matches are throttled; unset disables " +
        "throttling.",
      "Buffer"),
    Entry("buffer.throttled_trigger_ratio", "Int", "1",
      "Trigger-interval stretch for throttled queries " +
        "(RatioMessageBuffer semantics): fire every N-th interval.",
      "Buffer"),

    // --- Sideline ---
    Entry("sideline.refresh_interval_seconds", "Long", "600",
      "Cadence of the reconciler that re-reads persisted sideline " +
        "requests and re-applies missing filters/replays (reference " +
        "sideline.refresh_interval_seconds).",
      "Sideline"),
    Entry("sideline.trigger_class", "String", "—",
      "Optional pluggable control input that starts/resumes/resolves " +
        "sidelines: preset `directory_watch` (the ZookeeperWatchTrigger " +
        "analogue; also accepted under its reference class name) or any " +
        "`graft.sideline.SidelineTrigger` class.",
      "Sideline"),
    Entry("sideline.trigger.watch_dir", "String", "—",
      "Directory watched for TriggerEvent JSON docs. Required when " +
        "`sideline.trigger_class` is `directory_watch`.",
      "Sideline", required = true),
    Entry("sideline.trigger.poll_interval_ms", "Long", "1000",
      "Poll cadence of the directory-watch trigger.", "Sideline"),

    // --- Metrics ---
    Entry("spout.metrics.class", "String", "memory",
      "Metrics recorder: preset `memory` (in-memory counters/gauges; " +
        "also the `LogRecorder` alias), `histogram` (reservoir timers " +
        "with count/mean/p95/max series and a periodic log reporter; " +
        "also the `DropwizardRecorder` alias), or any " +
        "`graft.metrics.MetricsRecorder` class.",
      "Metrics"),
    Entry("spout.metrics.time_bucket", "Long", "60",
      "Seconds between snapshot flushes of the `histogram` recorder's " +
        "log reporter; <= 0 disables the reporter thread.",
      "Metrics"))

  private val SectionOrder =
    Seq("Coordinator", "Retry", "Persistence", "Buffer", "Sideline", "Metrics")

  /** Render the reference-README-style tables, one per section. */
  def markdown: String = {
    val sb = new StringBuilder
    sb.append("# Configuration\n\n")
    sb.append("Generated by `graft.engine.ConfigDocs` — do not edit by " +
      "hand; run `sbt \"runMain graft.engine.ConfigDocs\"` to regenerate.\n")
    sb.append("All keys are read by `graft.engine.GraftConfig`; reference " +
      "(storm-dynamic-spout SpoutConfig/SidelineConfig) key names are " +
      "kept where a counterpart exists, and reference implementation " +
      "class names are accepted as preset aliases.\n")
    for (section <- SectionOrder) {
      sb.append(s"\n## $section\n\n")
      sb.append("| Key | Type | Required | Default | Description |\n")
      sb.append("| --- | --- | --- | --- | --- |\n")
      for (e <- entries.filter(_.section == section)) {
        val req = if (e.required) "conditionally" else ""
        sb.append(s"| `${e.key}` | ${e.valueType} | $req | ${e.default} " +
          s"| ${e.description} |\n")
      }
    }
    sb.append(connectorSection)
    sb.toString
  }

  /** The V2 connector's DataFrame-reader/writer options — a different
    * configuration surface than GraftConfig keys (they ride
    * `option(...)` on the read/write builders), documented in the same
    * generated file so the suite keeps code and docs in lockstep. */
  private def connectorSection: String =
    """
      |## Native V2 log connector (`format("graftlog")`)
      |
      |Reader options (batch `spark.read` and streaming `spark.readStream`):
      |
      || Key | Type | Required | Default | Description |
      || --- | --- | --- | --- | --- |
      || `path` | String | yes | — | Root of the partitioned log (`partition=<p>/` segment directories). |
      || `startingOffsets` | String |  | earliest | `earliest`, `latest` (streaming only), or a JSON map `{"0":120,...}` of the first offset TO READ per partition. Streaming: out-of-range starts follow `failOnDataLoss`. Batch: bounds apply at planning. |
      || `endingOffsets` | String |  | latest | Batch only: `latest` or a JSON map of the EXCLUSIVE end per partition. A partition absent from an explicit map contributes nothing (the bounded-replay stance). |
      || `maxOffsetsPerTrigger` | Long |  | unlimited | Streaming admission budget per micro-batch, split proportionally over partition backlogs (Kafka-source rule). Honored under `Trigger.AvailableNow` too. |
      || `minOffsetsPerTrigger` | Long |  | — | Streaming small-batch suppression: defer a trigger while the total backlog is below this, until `maxTriggerDelayMs` expires. Composes with `maxOffsetsPerTrigger`; ignored while `Trigger.AvailableNow` drains (Kafka semantics). |
      || `maxTriggerDelayMs` | Long |  | 900000 | Upper bound on how long `minOffsetsPerTrigger` may hold a batch back (15 min — Kafka's maxTriggerDelay). |
      || `failOnDataLoss` | Boolean |  | true | Out-of-range start: fail loudly (true) or clamp to the log end with a warning (false). Also governs an explicit starting offset naming a partition ABSENT from the log (a truncated/rewritten log): fail loudly, or skip the vanished partition with a warning. |
      || `minPartitions` | Int |  | #log partitions | Read-parallelism hint: partition ranges split into offset sub-ranges proportionally to backlog (never finer than one offset per task; total never exceeds the hint). Non-positive or non-numeric values fail at planning. |
      |
      |Writer options (batch `df.write` mode `append`, and `df.writeStream` —
      |the streaming sink is exactly-once via the `_producer/<queryId>/<epoch>`
      |marker namespace — scoped per pipeline incarnation so a recreated
      |checkpoint's restarted batchIds cannot collide; one producer per log):
      |
      || Key | Type | Required | Default | Description |
      || --- | --- | --- | --- | --- |
      || `path` | String | yes | — | Log root to append into. |
      || `offsets` | String |  | provided | `provided`: rows carry explicit offsets, writer enforces per-partition density from the current end and fails loudly on a gap (STREAMING epoch replays relax the low side only: rows below the advanced footer end are already durable at those positions and are skipped). `assign`: the `offset` column is ignored (pass -1) and dense offsets are assigned in (key, value) order — `GraftLog.append` semantics. |
      |
      |The scan also reports statistics to Catalyst (exact row counts from
      |offset windows, bytes pro-rated by covered file fraction and projected
      |columns — small log sides auto-broadcast in joins) and implements the
      |V2 runtime-filtering hook (a join that filters `partition` prunes whole
      |partition directories between planning and execution — DPP for the log).
      |COUNT(*)/MIN(offset)/MAX(offset) with no grouping and no residual
      |filter are answered entirely from footer statistics (aggregate
      |pushdown — no data task planned), and LIMIT truncates the planned
      |windows.
      |
      |Maintenance faces (library API, maintenance window required):
      |`EpochCommit.compact` (+ `IncrementalDedup.compactCatalog` /
      |`compactBandCatalog`, `IvfIndex.compactIndex`) fold committed epochs
      |into one; `GraftLogMaintenance.compactSegments` merges a log
      |partition's many per-batch segment files into one (journaled,
      |positions unchanged); `GraftLog.appendBatch(df, dir, batchId, producerId)` /
      |`GraftLog.sink(dir, producerId)`
      |are the foreachBatch-shaped exactly-once producer faces.
      |
      |### SQL catalog (`graft.sources.GraftLogCatalog`)
      |
      |Logs addressable by name from pure SQL — set once per session:
      |
      || Key | Type | Required | Default | Description |
      || --- | --- | --- | --- | --- |
      || `spark.sql.catalog.<cat>` | String | yes | — | `graft.sources.GraftLogCatalog` — registers catalog `<cat>`. |
      || `spark.sql.catalog.<cat>.root` | String | yes | — | Directory holding the logs; a table named `a.b.c` is the log at `<root>/a/b/c`, namespaces are subdirectories. |
      |
      |Supported SQL: `CREATE TABLE <cat>.<log>` (schema fixed to the log
      |frame — omit the column list), `INSERT INTO` (the V2 write path,
      |dense-offset enforcement included), `SELECT` (full pushdown:
      |partition pruning, offset ranges, footer-stat aggregates, limit),
      |`SHOW TABLES/NAMESPACES`, `ALTER TABLE ... RENAME TO <bare name>`,
      |`DROP TABLE`, `CREATE/DROP NAMESPACE [CASCADE]`; plus
      |`spark.readStream.table` and `df.writeStream.toTable` for the
      |streaming faces; `TRUNCATE TABLE` is the explicit ops reset
      |(segments, producer markers and staging removed — the next
      |append restarts every partition at offset 0, and consumers of
      |the old incarnation fail loudly under `failOnDataLoss`).
      |ALTER TABLE/NAMESPACE mutations are rejected — a log's schema is
      |the message frame.
      |
      |Stored procedures (`CALL <cat>.system.<proc>(...)` — the
      |maintenance/observability faces without Scala; same maintenance
      |window contract as the library calls they wrap):
      |
      || Procedure | Args | Returns | Description |
      || --- | --- | --- | --- |
      || `committed_offsets` | `table` | (partition, next_offset) | Per-partition positions from parquet footer statistics — no data scan. |
      || `compact_segments` | `table`, `min_files` (default 2) | (partition, merged_segments) | Merge a partition's per-batch segment files into one (journaled, offsets unchanged). |
      || `recover_compaction` | `table` | (recovered) | Finish or abort a compaction a crash left in flight. |
      || `store_stats` | `path` | (face, epoch, committed, latest, files, bytes) | Per-epoch file counts/bytes of every EpochCommit-governed face under an operator-store path (IVF `assigned`/`codes`, kNN `edges`, dedup catalogs) — committed, torn, and latest flags, metadata only. |
      || `expire_epochs` | `path` | (expired_epoch) | Drop SUPERSEDED epochs (committed below the latest) of one supersede-semantics epoch root, e.g. a kNN graph's `edges` face. Never point it at a union-semantics store — there the history IS the data; use EpochCommit.compact instead. |
      || `sweep_torn` | `path` | (swept_epoch) | Delete torn (data without marker) epoch dirs of one epoch root — crash leftovers already invisible to readers; safe under any store semantics. |
      |""".stripMargin

  /** Regenerate docs/CONFIGURATION.md (or args(0)). */
  def main(args: Array[String]): Unit = {
    val target = java.nio.file.Paths.get(
      args.headOption.getOrElse("docs/CONFIGURATION.md"))
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(target, markdown)
    println(s"wrote ${target.toAbsolutePath} (${entries.size} keys)")
  }
}
