package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.execution.exchange.Exchange

class CompactionSuite extends SparkSuite {

  private def tmpDir(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_compact_${tag}_${ProcessHandle.current().pid()}"

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(): Unit
    }
    go(new java.io.File(path))
  }

  private def dataFiles(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet")).toSeq

  private def flatten = flattenPlan _ // shared AQE-aware walk (SparkSuite)

  test("compaction merges small files without a shuffle and preserves rows") {
    val src = tmpDir("src"); val dst = tmpDir("dst")
    try {
      val sparkS = spark; import sparkS.implicits._
      val df = (0 until 10000).map(i => (i.toLong, s"row $i")).toDF("id", "payload")
      df.repartition(64).write.parquet(src) // the small-files mess
      assert(dataFiles(src).size === 64)
      val before = Compaction.plan(spark, src, targetBytes = 1L << 30)
      assert(before.files === 64)
      assert(before.targetPartitions === 1, "10k tiny rows fit one 1 GiB target file")

      // shrink path must be shuffle-free: coalesce, not repartition
      val (laid, _) = Compaction.compacted(spark, src, 1L << 30)
      laid.collect()
      assert(!flatten(laid.queryExecution.executedPlan).exists(_.isInstanceOf[Exchange]),
        laid.queryExecution.executedPlan.toString.take(2000))

      val pl = Compaction.compact(spark, src, dst, 1L << 30)
      assert(pl.targetPartitions === 1)
      assert(dataFiles(dst).size === 1)
      // content parity both ways
      val out = spark.read.parquet(dst)
      assert(out.exceptAll(df).count() === 0)
      assert(df.exceptAll(out).count() === 0)
    } finally { rm(src); rm(dst) }
  }

  test("empty dataset is a counted no-op; sneaky same-path spellings are refused") {
    val src = tmpDir("empty"); val dst = tmpDir("emptydst")
    try {
      new java.io.File(src).mkdirs()
      new java.io.File(src, "_SUCCESS").createNewFile()
      val pl = Compaction.compact(spark, src, dst, 1L << 20)
      assert(pl === Compaction.Plan(0, 0L, 1), "no data files -> no-op, no crash")
      assert(!new java.io.File(dst).exists(), "nothing was written")
      // a `..` spelling of the SAME directory must not pass the guard
      val sneaky = s"$src/sub/../../${new java.io.File(src).getName}"
      intercept[IllegalArgumentException] {
        Compaction.compact(spark, src, sneaky, 1L << 20)
      }
    } finally { rm(src); rm(dst) }
  }

  test("growing the layout repartitions; in-place compaction is refused") {
    val src = tmpDir("grow"); val dst = tmpDir("growdst")
    try {
      val sparkS = spark; import sparkS.implicits._
      (0 until 1000).map(i => (i.toLong, i.toString)).toDF("id", "v")
        .coalesce(1).write.parquet(src)
      // absurdly small target forces growth past the single input split
      val (laid, pl) = Compaction.compacted(spark, src, targetBytes = 1024)
      assert(pl.targetPartitions > 1)
      laid.collect()
      assert(flatten(laid.queryExecution.executedPlan).exists(_.isInstanceOf[Exchange]),
        "growing parallelism requires redistribution")
      intercept[IllegalArgumentException] {
        Compaction.compact(spark, src, src, 1L << 30)
      }
    } finally { rm(src); rm(dst) }
  }
}
