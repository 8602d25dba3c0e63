package graft.model

import scala.collection.immutable.TreeSet

/**
 * Contiguous-ack watermark tracking — the reference's
 * PartitionOffsetManager (dynamic/consumer/PartitionOffsetManager.java:
 * 53-193: two sorted sets, watermark = highest contiguous finished
 * offset). Spark's checkpoint subsumes this for the engine's own delivery
 * (SURVEY.md §1.3); this pure value type exists for users who track
 * per-record completion OUTSIDE the engine (e.g. async downstream acks)
 * and want the same replay-over-skip cut the reference computes.
 *
 * Worked example (kafka/Consumer.java:62-90): start 0..5, finish
 * {0,1,4,5,2} => watermark 2; restart replays 3,4,5.
 */
final case class OffsetWatermark(
    lastFinished: Long,
    pendingStarted: TreeSet[Long],
    finishedAhead: TreeSet[Long]) {

  /** Track a newly emitted offset (reference startOffset). */
  def start(offset: Long): OffsetWatermark =
    if (offset <= lastFinished) this
    else copy(pendingStarted = pendingStarted + offset)

  /** Finish (ack) an offset; advances the watermark across any contiguous
    * run it completes (reference finishOffset:119-165). */
  def finish(offset: Long): OffsetWatermark = {
    if (offset <= lastFinished) return this
    var wm = lastFinished
    var ahead = finishedAhead + offset
    var pending = pendingStarted - offset
    // advance while the next offset is finished-ahead AND no earlier
    // offset is still pending
    var continue = true
    while (continue) {
      val next = wm + 1
      if (ahead.contains(next) && pending.forall(_ > next)) {
        wm = next; ahead = ahead - next
      } else continue = false
    }
    OffsetWatermark(wm, pending, ahead)
  }

  /** Offsets that would replay on restart: everything after the watermark
    * that was started but is not contiguously finished. */
  def replaySet: TreeSet[Long] = pendingStarted ++ finishedAhead
}

object OffsetWatermark {
  def initial(lastFinished: Long = -1L): OffsetWatermark =
    OffsetWatermark(lastFinished, TreeSet.empty, TreeSet.empty)
}
