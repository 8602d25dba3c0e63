package graft.sources

import graft.SparkSuite
import org.apache.spark.storage.StorageLevel

/**
 * ParquetEventLog session cache lifecycle (carried-5-rounds r1 item): the
 * synthesized-offset view is cached per (session, dir, partitions), and a
 * finished session's entries must be RELEASED — explicitly via
 * invalidate(), or automatically when its context ends (ApplicationEnd
 * listener / stopped-context sweep).
 */
class LogSourceCacheSuite extends SparkSuite {

  private val log = ParquetEventLog(sfDir, 4)

  test("cache is per session: one entry per session, reused across reads") {
    ParquetEventLog.invalidate(spark)
    val df1 = log.read(spark)
    val df2 = log.read(spark)
    assert(df1 eq df2, "second read must reuse the cached view")
    assert(ParquetEventLog.cachedFor(spark) === 1)
    assert(df1.storageLevel === StorageLevel.MEMORY_AND_DISK)

    val s2 = spark.newSession()
    val other = log.read(s2)
    assert(!(other eq df1))
    assert(ParquetEventLog.cachedFor(s2) === 1)
    ParquetEventLog.invalidate(s2)
  }

  test("invalidate releases that session's entries; blocks live until the last sharer goes") {
    ParquetEventLog.invalidate(spark)
    val s2 = spark.newSession()
    val mine = log.read(spark)
    val theirs = log.read(s2)
    mine.count(); theirs.count() // materialize cached blocks

    ParquetEventLog.invalidate(s2)
    assert(ParquetEventLog.cachedFor(s2) === 0, "finished session entry leaked")
    // the sibling session still caches the same canonical plan, so the
    // shared blocks must SURVIVE the first invalidate...
    assert(ParquetEventLog.cachedFor(spark) === 1)
    assert(mine.storageLevel === StorageLevel.MEMORY_AND_DISK)

    // ...and be released with the LAST holder
    ParquetEventLog.invalidate(spark)
    assert(ParquetEventLog.cachedFor(spark) === 0)
    assert(mine.storageLevel === StorageLevel.NONE, "blocks not unpersisted")

    // released ≠ broken: the next read rebuilds
    val rebuilt = log.read(s2)
    assert(rebuilt.count() > 0)
    ParquetEventLog.invalidate(s2)
  }

  test("context end releases every entry of that context") {
    ParquetEventLog.invalidate(spark)
    val s2 = spark.newSession()
    val a = log.read(spark)
    val b = log.read(s2)
    a.count(); b.count()
    assert(ParquetEventLog.cachedFor(spark) + ParquetEventLog.cachedFor(s2) === 2)

    // the ApplicationEnd listener calls exactly this (the suite JVM shares
    // its context across suites, so the release path is driven directly
    // rather than by stopping the context)
    ParquetEventLog.releaseContext(spark.sparkContext)
    assert(ParquetEventLog.cachedFor(spark) === 0)
    assert(ParquetEventLog.cachedFor(s2) === 0)
    assert(a.storageLevel === StorageLevel.NONE)
    assert(b.storageLevel === StorageLevel.NONE)

    // cache still functional afterwards
    assert(log.read(spark).count() > 0)
    ParquetEventLog.invalidate(spark)
  }
}
