package graft.engine

import graft.SparkSuite
import graft.filter.FilterSpec
import graft.sideline.{DirectoryWatchTrigger, SidelineType, TriggerEvent}
import graft.sources.ParquetEventLog
import org.apache.spark.sql.functions.col

import java.nio.file.Files

/**
 * Config-to-running-engine E2E: everything below is wired from STRING
 * config (the reference's FactoryManager story) — file control store,
 * directory-watch trigger, reconcile loop — and a dropped TriggerEvent
 * doc changes what the firehose emits with no code-level API call.
 */
class GraftRuntimeSuite extends SparkSuite {

  test("string config assembles store+trigger+reconciler; file drop filters the firehose") {
    val ctlDir = Files.createTempDirectory("graft-rt-store").toString
    val watchDir = Files.createTempDirectory("graft-rt-watch").toString
    val config = GraftConfig(Map(
      "sideline.persistence.class" -> "file",
      "sideline.persistence.dir" -> ctlDir,
      "sideline.trigger_class" -> "directory_watch",
      "sideline.trigger.watch_dir" -> watchDir,
      "sideline.trigger.poll_interval_ms" -> "50",
      "sideline.refresh_interval_seconds" -> "600",
      "spout.coordinator.max_concurrent_virtual_spouts" -> "4"))

    val rt = new GraftRuntime(spark, ParquetEventLog(sfDir), config)
    try {
      assert(rt.trigger.isDefined)

      // before any sideline: firehose passes error rows through
      assert(rt.engine.firehose(spark).filter(col("event_type") === "error").count() > 0)

      // drop a START doc into the watched dir — the polling trigger
      // (50 ms) must install the drop-predicate with no API call
      val id = DirectoryWatchTrigger.publish(watchDir, TriggerEvent(
        SidelineType.Start, FilterSpec.KeyIn("event_type", Seq("error")),
        createdAtMillis = Some(7L), createdBy = "ops",
        description = "config-driven e2e", processed = false))
      val deadline = System.nanoTime() + 10_000_000_000L
      while (rt.engine.status(id).isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(rt.engine.status(id).contains(SidelineType.Start))

      // the NEXT firehose derivation drops the sidelined rows
      assert(rt.engine.firehose(spark).filter(col("event_type") === "error").count() === 0)

      // reconcile pass surfaces the persisted request (restart story)
      val seen = scala.collection.mutable.Buffer.empty[String]
      rt.startReconciler(p => seen += s"${p.id}:${p.sidelineType.name}")
      val d2 = System.nanoTime() + 10_000_000_000L
      while (seen.isEmpty && System.nanoTime() < d2) Thread.sleep(20)
      assert(seen.headOption.contains(s"$id:START"))
    } finally rt.close()
  }
}
