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
      val marker = new java.io.File(s"$path/edges/_epochs/0")
      assert(marker.exists(), "expected epoch marker after build")
      assert(marker.delete())
      assert(KnnGraphStore.edges(spark, path).count() === 0L,
        "uncommitted epoch leaked into the edge view")
    } finally rm(new java.io.File(path))
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
