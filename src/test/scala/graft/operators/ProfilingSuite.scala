package graft.operators

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** The corpus manifest's defining property: the Merkle root pins the
  * exact content set — ANY single-document difference (edit, add,
  * remove) flips it, and identical content yields identical roots
  * regardless of row order or ids' physical layout. */
class ProfilingSuite extends SparkSuite {

  private def root(dir: String): String =
    SparkEntry.queries("profile_manifest")(spark, dir)
      .select("corpus_root").head().getString(0)

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("manifest").toString
    rows.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("manifest root flips on edit/add/remove; stable under reordering") {
    val base = Seq(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon zeta")
    val r0 = root(writeDocs(base))
    // same content, different physical order → same root
    assert(root(writeDocs(base.reverse)) == r0)
    // one-character edit in one doc → different root
    assert(root(writeDocs(base.updated(1, 2L -> "gamma deltA"))) != r0)
    // one doc added / removed → different root
    assert(root(writeDocs(base :+ (4L -> "eta theta"))) != r0)
    assert(root(writeDocs(base.take(2))) != r0)
    // per-shard digests roll up to the root deterministically
    val rows = SparkEntry.queries("profile_manifest")(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("corpus_root")).distinct.length == 1)
    assert(rows.map(_.getAs[String]("shard_digest")).distinct.length == rows.length)
  }
}
