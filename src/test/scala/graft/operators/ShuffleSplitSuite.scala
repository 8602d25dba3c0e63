package graft.operators

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * `shuffle_corpus` (seeded global permutation via distributed prefix
 * sum) and `split_holdout` (content-keyed train/valid/test split).
 *
 * The oracles pin row values; this suite pins (a) the decomposition
 * contract — prefix-sum positions equal the naive global-window form
 * exactly, and positions are a permutation of 1..N; (b) the LEAKAGE
 * property the split exists for — byte-identical documents always land
 * in the same split; (c) the plan shape — the only WindowExec with an
 * empty partition spec runs over the metadata-sized bucket histogram
 * (an aggregate), never the corpus.
 */
class ShuffleSplitSuite extends SparkSuite {

  private def collect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => collect(a.executedPlan)(pf)
      case q: QueryStageExec        => collect(q.plan)(pf)
      case other => other.children.flatMap(c => collect(c)(pf))
    }
    pf.lift(p).toSeq ++ here
  }

  test("shuffle_corpus positions equal the naive global row_number form") {
    val got = SparkEntry.queries("shuffle_corpus")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))

    val naive = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(concat(lit("shuffle:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("pos",
        row_number().over(Window.orderBy("skey", "doc_id")).cast("long"))
      .select("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    assert(got.toSeq === naive.sortBy(_._2).toSeq)
    // permutation: every position 1..N exactly once
    assert(got.map(_._2).toSeq === (1L to got.length.toLong))
  }

  test("shuffle_corpus's only unpartitioned window runs over the bucket histogram") {
    val df = SparkEntry.queries("shuffle_corpus")(spark, sfDir)
    df.collect()
    val windows = collect(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(windows.nonEmpty, "expected window operators in the plan")
    val (global, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    assert(partitioned.nonEmpty,
      "corpus-sized ranking must be partitioned (by bucket)")
    global.foreach { w =>
      val aggBelow = collect(w) { case a: BaseAggregateExec => a }
      assert(aggBelow.nonEmpty,
        s"unpartitioned window must scan the aggregated histogram, " +
          s"not the corpus:\n$w")
    }
  }

  test("split_holdout: byte-identical documents always share a split") {
    // the driver fixture has no byte-identical texts at this SF, so the
    // leakage case is driven against a copy with every document
    // duplicated under a fresh id (the query reads <dir>/documents.parquet)
    val dirPath = java.nio.file.Files.createTempDirectory("split-leakage")
    try {
      val dir = dirPath.toString
      val docs = Tables.documents(spark, sfDir)
      docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val split = SparkEntry.queries("split_holdout")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // fingerprint is md5(text): group by it, demand one split per group
      val dupGroups = split.groupBy(_._2).filter(_._2.length > 1)
      assert(dupGroups.nonEmpty, "duplicated fixture lost its duplicates")
      dupGroups.foreach { case (fp, members) =>
        assert(members.map(_._3).distinct.length == 1,
          s"fingerprint $fp split across sides: $members")
      }
    } finally {
      import java.nio.file.Files
      import scala.jdk.CollectionConverters._
      Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("sample_weighted favors heavy documents and matches a pure-Scala replay") {
    // engine-independent third voice: replay the integer A-ES key from
    // the raw text (mlog2 re-derived in plain Scala) and take top-k
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val scale = 1048576L
    def mlog2(x: Long): Long = {
      val l = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val p = 1L << l
      l * scale + (x - p) * scale / p
    }
    val keyed = docs.map { case (id, text) =>
      val w = math.max(1L, text.split(" ", -1).length.toLong)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsample:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(4)
      val h = java.lang.Long.parseLong(hex, 16) + 1
      val key = (16 * scale - mlog2(h)) * scale / w
      (id, w, key)
    }
    val expect = keyed.sortBy { case (id, _, k) => (k, id) }.take(50)
      .map { case (id, w, k) => (id, w, k) }
    val got = graft.SparkEntry.queries("sample_weighted")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect.toSeq)
    // weighting is real: the sample's mean token count exceeds the
    // corpus mean (token-proportional draws favor long docs)
    val corpusMean = keyed.map(_._2).sum.toDouble / keyed.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("split_holdout fractions are near 90/5/5 and cover every document") {
    val split = SparkEntry.queries("split_holdout")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val n = split.length
    assert(n == Tables.documents(spark, sfDir).count())
    val frac = split.groupBy(_._2).view.mapValues(_.length.toDouble / n).toMap
    assert(frac.keySet == Set("train", "valid", "test"), frac.toString)
    // a 16-bit hash over thousands of docs: generous tolerance, but a
    // swapped threshold or broken hash lands far outside these bands
    assert(frac("train") > 0.8 && frac("train") < 0.97, frac.toString)
    assert(frac("valid") < 0.12 && frac("test") < 0.12, frac.toString)
  }
}
