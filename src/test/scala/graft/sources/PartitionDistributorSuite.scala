package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference PartitionDistributorTest (assignment math): every
  * partition assigned exactly once, balanced within one, contiguous. */
class PartitionDistributorSuite extends AnyFunSuite {

  test("reference worked examples") {
    // 2 consumers, 4 partitions -> [0,1] and [2,3]
    assert(PartitionDistributor.assign(2, 0, Seq(0, 1, 2, 3)) === Seq(0, 1))
    assert(PartitionDistributor.assign(2, 1, Seq(0, 1, 2, 3)) === Seq(2, 3))
    // 3 consumers, 4 partitions -> [0,1], [2], [3]
    assert(PartitionDistributor.assign(3, 0, Seq(0, 1, 2, 3)) === Seq(0, 1))
    assert(PartitionDistributor.assign(3, 1, Seq(0, 1, 2, 3)) === Seq(2))
    assert(PartitionDistributor.assign(3, 2, Seq(0, 1, 2, 3)) === Seq(3))
    // 1 consumer takes all; unsorted input is sorted first
    assert(PartitionDistributor.assign(1, 0, Seq(3, 1, 0, 2)) === Seq(0, 1, 2, 3))
  }

  test("exhaustive: cover, disjoint, contiguous, ceil-bounded, none empty (P<=40)") {
    for (parts <- 1 to 40; consumers <- 1 to parts) {
      val ids = 0 until parts
      val all = (0 until consumers).map(c => PartitionDistributor.assign(consumers, c, ids))
      // cover + disjoint
      assert(all.flatten.sorted === ids, s"C=$consumers P=$parts")
      // reference greedy fills up to ceil(P/C) per consumer (NOT min-max
      // balanced: C=3,P=7 gives sizes (3,3,1) — PartitionDistributor.java:48-109)
      val maxPer = math.ceil(parts.toDouble / consumers).toInt
      val sizes = all.map(_.size)
      assert(sizes.max <= maxPer, s"C=$consumers P=$parts sizes=$sizes")
      // every consumer gets at least one (consumers <= parts)
      assert(sizes.min >= 1, s"C=$consumers P=$parts sizes=$sizes")
      // contiguous ranges in sorted order
      all.foreach { a => if (a.nonEmpty) assert(a === (a.head to a.last)) }
    }
  }
}
