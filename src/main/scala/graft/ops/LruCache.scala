package graft.ops

/** Tiny thread-safe bounded LRU — the memoization shape the connector
  * and epoch-protocol metadata caches need: immutable facts (parquet
  * footer envelopes, commit-marker existence) cached per JVM, but
  * BOUNDED so a year-long streaming driver over a 10M-segment log
  * holds a few MB of hot entries, not every footer it ever read.
  *
  * The value thunk runs OUTSIDE the lock (footer reads are metadata
  * RPCs — serializing concurrent tasks on them would be worse than the
  * occasional duplicate read a race admits; entries are immutable so a
  * duplicate compute is only wasted work, never wrong).
  *
  * CONTRACT for thunks: non-null (a null result reads as a permanent
  * miss and recomputes forever) and side-effect-free/idempotent over an
  * IMMUTABLE fact. Do NOT cache lookups whose answer can legitimately
  * change from false to true (e.g. commit-marker existence before the
  * commit): a racing duplicate compute could pin the pre-commit answer.
  * Those need per-key future memoization or a re-check-on-negative
  * policy ([[graft.ops.EpochCommit.markerExists]]'s shape), not this.
  */
final class LruCache[K, V <: AnyRef](maxEntries: Int) {
  private val m = new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }

  def getOrElseUpdate(k: K)(v: => V): V = {
    val got = m.synchronized(m.get(k))
    if (got != null) got
    else {
      val nv = v
      m.synchronized(m.put(k, nv))
      nv
    }
  }

  /** Peek without computing (used by contains-style fast paths). */
  def get(k: K): Option[V] = Option(m.synchronized(m.get(k)))

  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }

  def remove(k: K): Unit = m.synchronized { m.remove(k); () }

  def size: Int = m.synchronized(m.size())
}
