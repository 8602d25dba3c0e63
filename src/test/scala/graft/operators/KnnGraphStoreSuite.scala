package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The persisted kNN graph: the round-trip must be row-identical to the
  * inline `knn_graph` query, point probes must partition-prune to their
  * buckets, and `graph_triangles` must consume the store instead of
  * re-running the kNN chain. */
class KnnGraphStoreSuite extends SparkSuite {

  private def withStore[A](f: String => A): A = {
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_knng_$pid"
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
    }
    rm(new java.io.File(path))
    try {
      KnnGraphStore.build(spark, sfDir, path)
      f(path)
    } finally rm(new java.io.File(path))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("persisted edges equal the inline knn_graph row-for-row") {
    withStore { path =>
      val inline = rows(Similarity.all("knn_graph").fn(spark, sfDir))
      val persisted = rows(KnnGraphStore.edges(spark, path))
      assert(persisted === inline)
      assert(inline.nonEmpty)
    }
  }

  test("a point probe is partition-pruned to its buckets") {
    withStore { path =>
      // two nodes in the same bucket: 1/NumBuckets of the layout read
      val nodes = Seq(3L, 3L + KnnGraphStore.NumBuckets)
      val df = KnnGraphStore.neighbors(spark, path, nodes)
      val got = df.collect().map(_.getLong(0)).toSet
      assert(got.subsetOf(nodes.toSet) && got.nonEmpty)
      val scans = flattenPlan(df.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no file scan over the edge layout found")
      scans.foreach { scan =>
        assert(scan.partitionFilters.nonEmpty,
          "edge scan must carry a bucket partition filter:\n" + scan.toString)
        val parts = scan.relation.location.listFiles(
          scan.partitionFilters, scan.dataFilters)
        assert(parts.length <= 1,
          s"probe read ${parts.length} bucket partitions, expected 1")
      }
    }
  }

  test("a torn build (no epoch marker) is invisible to readers") {
    val pid = ProcessHandle.current().pid()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_knng_torn_$pid"
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
    }
    rm(new java.io.File(path))
    try {
      KnnGraphStore.build(spark, sfDir, path)
      // simulate the crash ordering: data landed, marker did not
      val marker = new java.io.File(s"$path/edges/_epochs/1")
      assert(marker.exists(), "expected epoch marker after build")
      assert(marker.delete())
      assert(KnnGraphStore.edges(spark, path).count() === 0L,
        "uncommitted epoch leaked into the edge view")
    } finally rm(new java.io.File(path))
  }

  test("refresh supersedes atomically: torn refresh invisible, swap on commit, expire drops old epochs") {
    val pid = ProcessHandle.current().pid()
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_knng_refresh_$pid"
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
    }
    rm(new java.io.File(base))
    val path = s"$base/store"
    // a SMALLER corpus for the initial build (vec_id < half) — the
    // refresh from the full corpus then visibly changes the edge list
    val smallDir = s"$base/small"
    val full = graft.Tables.embeddings(spark, sfDir)
    val cut = full.agg(expr("percentile_approx(vec_id, 0.5)")).head().getLong(0)
    full.filter(col("vec_id") < cut).write.parquet(s"$smallDir/embeddings.parquet")
    try {
      KnnGraphStore.build(spark, smallDir, path)
      val first = rows(KnnGraphStore.edges(spark, path))
      assert(first.nonEmpty && first.forall(_._1 < cut))

      // torn refresh: the full-corpus epoch lands but its marker doesn't
      val torn = KnnGraphStore.refresh(spark, sfDir, path)
      assert(new java.io.File(s"$path/edges/_epochs/$torn").delete())
      assert(rows(KnnGraphStore.edges(spark, path)) === first,
        "a torn refresh changed the reader view before its marker")

      // committed refresh: readers swap to the NEW artifact — supersede,
      // not union (the old epoch's rows must not be served alongside)
      val e2 = KnnGraphStore.refresh(spark, sfDir, path)
      val second = rows(KnnGraphStore.edges(spark, path))
      assert(second === rows(Similarity.all("knn_graph").fn(spark, sfDir)),
        "post-refresh view must equal the full corpus' inline knn_graph")
      assert(second.exists(_._1 >= cut), "refresh did not pick up new nodes")
      assert(first.length < second.length)

      // both epochs' data on disk until expiry; only the latest served
      val epochDirs = new java.io.File(s"$path/edges").listFiles()
        .filter(_.getName.startsWith("epoch=")).map(_.getName).toSet
      assert(epochDirs.size === 2, s"expected 2 committed epoch dirs, got $epochDirs")
      // a point probe with BOTH epochs on disk still lists exactly one
      // (epoch, bucket) partition — the latest-epoch filter prunes like
      // the bucket filter does
      val probe = KnnGraphStore.neighbors(spark, path, Seq(second.head._1))
      val scans = flattenPlan(probe.queryExecution.executedPlan).collect {
        case sc: FileSourceScanExec => sc
      }
      assert(scans.nonEmpty)
      scans.foreach { sc =>
        val parts = sc.relation.location.listFiles(sc.partitionFilters, sc.dataFilters)
        assert(parts.length <= 1,
          s"probe over 2 epochs read ${parts.length} partitions, expected 1")
      }

      val expired = KnnGraphStore.expire(spark, path)
      assert(expired.nonEmpty && expired.forall(_ < e2), expired.toString)
      val after = new java.io.File(s"$path/edges").listFiles()
        .filter(_.getName.startsWith("epoch=")).map(_.getName).toSet
      assert(after === Set(s"epoch=$e2"), after.toString)
      assert(rows(KnnGraphStore.edges(spark, path)) === second,
        "expiry changed the served artifact")
      // and a point probe still prunes + answers from the live epoch
      assert(KnnGraphStore.neighbors(spark, path, Seq(second.head._1))
        .count() > 0)
    } finally rm(new java.io.File(base))
  }

  test("mutualEdges keeps only pairs ranked by BOTH endpoints, once each") {
    val s = spark
    import s.implicits._
    // 1<->2 mutual; 1->3 one-way; 4<->5 mutual
    val directed = Seq(
      (1L, 1, 2L, 0.9), (2L, 1, 1L, 0.9),
      (1L, 2, 3L, 0.5),
      (4L, 1, 5L, 0.8), (5L, 1, 4L, 0.8))
      .toDF("query_id", "rank", "neighbor_id", "sim")
    val und = KnnGraphStore.mutualEdges(directed)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(und === Seq((1L, 2L), (4L, 5L)))
  }
}
