package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The dynamic-overwrite contract, asserted on files: replacing one
  * day's partition must leave every other partition's files untouched
  * (same paths, same mtimes) and must fully replace the target day. */
class PartitionUpsertSuite extends SparkSuite {

  test("overwritePartitions replaces only the partitions present in the frame") {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempDirectory("upsert")
    try {
      val ev = Tables.events(spark, sfDir)
        .withColumn("day", to_date(col("ts")))
      PartitionUpsert.writePartitioned(ev, "day", out.toString)

      val days = new java.io.File(out.toString).listFiles()
        .filter(_.getName.startsWith("day=")).map(_.getName).sorted
      assert(days.length > 5)
      val target = days(2).stripPrefix("day=")

      def stamps() = java.nio.file.Files.walk(out).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      val before = stamps()
      val countBefore = spark.read.parquet(out.toString).count()

      // backfill: the target day's rows with a corrected value
      val patch = ev.filter(col("day") === lit(target).cast("date"))
        .withColumn("value", col("value") + 1000.0)
      val patchRows = patch.count()
      assert(patchRows > 0)
      PartitionUpsert.overwritePartitions(patch, "day", out.toString)

      val after = stamps()
      // untouched partitions: identical file sets and mtimes
      val (tgt, rest) = before.partition(_._1.contains(s"day=$target"))
      rest.foreach { case (p, t) =>
        assert(after.get(p).contains(t), s"$p churned by an unrelated upsert") }
      // target partition: fully replaced (old files gone)
      tgt.keys.foreach(p => assert(!after.contains(p), s"$p survived overwrite"))

      val back = spark.read.parquet(out.toString)
      assert(back.count() === countBefore)
      // corrected values landed, exactly on the target day
      val corrected = back.filter(col("value") >= 1000.0)
      assert(corrected.count() === patchRows)
      assert(corrected.filter(col("day") =!= lit(target).cast("date")).count() === 0L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
