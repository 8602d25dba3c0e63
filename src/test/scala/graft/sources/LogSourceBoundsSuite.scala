package graft.sources

import graft.SparkSuite
import graft.model.{ConsumerPartition, ConsumerState}
import org.apache.spark.sql.DataFrame

/**
 * Bounded-scan scale shape: readBounded inlines bounds as a pushed
 * predicate for few partitions and switches to a broadcast-joined bound
 * table past [[LogSource.MaxInlineBounds]] — a 10k-partition log must not
 * hand Catalyst a 10k-term Or. Both paths must be row-identical on every
 * semantic edge (exclusive start, inclusive end, absent-partition rules).
 */
class LogSourceBoundsSuite extends SparkSuite {

  private val log = ParquetEventLog(sfDir, 4)

  private def cs(pairs: (Int, Long)*): ConsumerState =
    ConsumerState(pairs.map { case (p, o) =>
      ConsumerPartition("events", p) -> o
    }.toMap)

  private def rows(df: DataFrame): Set[(Int, Long)] =
    df.select("partition", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

  private def startMap(s: ConsumerState): Map[Int, Long] =
    s.offsets.map { case (cp, o) => cp.partition -> o }

  test("join path ≡ inline path on every bounds shape") {
    val shapes: Seq[(ConsumerState, Option[ConsumerState])] = Seq(
      // full window on all partitions
      (cs(0 -> 50L, 1 -> 50L, 2 -> 50L, 3 -> 50L),
        Some(cs(0 -> 150L, 1 -> 150L, 2 -> 150L, 3 -> 150L))),
      // start missing a partition (reads from the beginning there)
      (cs(0 -> 100L, 1 -> 100L),
        Some(cs(0 -> 200L, 1 -> 200L, 2 -> 200L, 3 -> 200L))),
      // ending missing partitions (those contribute NOTHING)
      (cs(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 10L),
        Some(cs(0 -> 99L, 2 -> 99L))),
      // unbounded end
      (cs(0 -> 300L, 1 -> 300L, 2 -> 300L, 3 -> 300L), None),
      // empty start (from the beginning everywhere)
      (ConsumerState.empty, Some(cs(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L))),
      // degenerate window (start == end => empty)
      (cs(0 -> 42L), Some(cs(0 -> 42L))))
    for ((start, end) <- shapes) {
      val inline = rows(log.readBoundedInline(spark, startMap(start),
        end.map(startMap)))
      val joined = rows(log.readBoundedJoin(spark, startMap(start),
        end.map(startMap)))
      assert(joined === inline, s"paths diverge for start=$start end=$end")
      // and the public API (inline at this partition count) agrees
      assert(rows(log.readBounded(spark, start, end)) === inline)
    }
  }

  test("exclusive-start / inclusive-end semantics hold on the join path") {
    val out = rows(log.readBoundedJoin(spark, Map(0 -> 100L),
      Some(Map(0 -> 110L))))
    assert(out.forall { case (p, o) => p == 0 && o > 100L && o <= 110L })
    assert(out.map(_._2) === (101L to 110L).toSet)
  }

  test("thousands of partition bounds plan as one broadcast join, not a giant Or") {
    // 2000 bound entries (only 0..3 exist in the data): the public API
    // must select the join path and keep the filter condition O(1). The
    // inline path is not even CONSTRUCTIBLE at this width — building the
    // 1000-term Or tree overflows the stack (verified while writing this
    // test), which is precisely the scale hazard the join path removes.
    val start = cs((0 until 1000).map(p => p -> 50L): _*)
    val end = cs((0 until 1000).map(p => p -> 150L): _*)
    val df = log.readBounded(spark, start, Some(end))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(3000))
    // the 1000-term disjunction must NOT appear anywhere in the plan
    assert("partition#\\d+ = \\d+\\)".r.findAllIn(plan).size < 20, plan.take(3000))
    // rows agree with the inline path over the bounds that actually have
    // data (partitions 4..999 are empty, so restricting is equivalent)
    val expected = rows(log.readBoundedInline(spark,
      startMap(start).filter(_._1 < 4),
      Some(startMap(end).filter(_._1 < 4))))
    assert(rows(df) === expected)
  }

  test("streaming resume from a many-partition snapshot takes the join path") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bounds-stream").toString
    (0 until 2).foreach { p =>
      (0L until 20L).map(o => (p, o, s"v$o"))
        .toDF("partition", "offset", "value")
        .write.mode("append").parquet(s"$dir/d$p")
    }
    val schema = spark.read.parquet(s"$dir/d0").schema
    val src = FileLogSource(s"$dir/d*", schema)
    // 1000-partition snapshot: inline would be the giant-Or hazard; the
    // stream-static broadcast join must produce the exact resume window
    val from = ConsumerState((0 until 1000).map(p =>
      ConsumerPartition("file", p) -> 9L).toMap)
    val q = src.readStreamFrom(spark, from)
      .writeStream.format("memory").queryName("bounds_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val out = spark.table("bounds_stream")
        .select("partition", "offset").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(out === (for (p <- 0 until 2; o <- 10L until 20L) yield (p, o)).toSet)
    } finally q.stop()
  }
}
