package graft.model

import org.scalatest.funsuite.AnyFunSuite

class OffsetWatermarkSuite extends AnyFunSuite {

  test("reference worked example: acks 0,1,4,5,2 => watermark 2") {
    var w = OffsetWatermark.initial()
    (0L to 5L).foreach(o => w = w.start(o))
    Seq(0L, 1L, 4L, 5L, 2L).foreach(o => w = w.finish(o))
    assert(w.lastFinished === 2L)
    // reference doc: "restart re-emits 3,4,5" — acked-ahead offsets replay
    // too (replay-over-skip bias, kafka/Consumer.java:62-90)
    assert(w.replaySet === scala.collection.immutable.TreeSet(3L, 4L, 5L))
    w = w.finish(3L)
    assert(w.lastFinished === 5L)
    assert(w.replaySet.isEmpty)
  }

  test("property (seeded): watermark = longest contiguous acked prefix") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      var w = OffsetWatermark.initial()
      (0L until n.toLong).foreach(o => w = w.start(o))
      val perm = rnd.shuffle((0L until n.toLong).toVector)
      val ackCount = rnd.nextInt(n + 1)
      val acked = perm.take(ackCount)
      acked.foreach(o => w = w.finish(o))
      val ackedSet = acked.toSet
      val expected = (-1L until n.toLong)
        .takeWhile(o => o == -1L || ackedSet.contains(o)).last
      assert(w.lastFinished === expected,
        s"n=$n acked=${acked.sorted}")
      // replay set = every started offset above the watermark (acked-ahead
      // or still pending — both replay on restart, replay-over-skip bias)
      assert(w.replaySet.toSet === ((expected + 1) until n.toLong).toSet)
    }
  }

  test("finish below watermark and duplicate finishes are no-ops") {
    var w = OffsetWatermark.initial()
    (0L to 3L).foreach(o => w = w.start(o))
    w = w.finish(0L).finish(1L)
    assert(w.lastFinished === 1L)
    assert(w.finish(0L) === w)
    assert(w.finish(1L) === w)
  }
}
