package graft.operators

/**
 * Per-JVM memo for build-once/probe-many on-disk artifacts (IVF
 * indexes, the kNN graph): one build per (tag, testdata dir) per JVM —
 * the files are session-independent, so the memo keys on the dir
 * alone. Racing threads may create two holders but `putIfAbsent` picks
 * one winner and only its lazy `value` builds; a failed build leaves
 * the lazy uninitialized (retried next call); a shutdown hook reclaims
 * the files.
 */
private[operators] object FixtureStore {

  private final class LazyFixture(build0: () => String) {
    lazy val value: String = build0()
  }
  private val fixtures =
    scala.collection.concurrent.TrieMap.empty[String, LazyFixture]

  private[operators] def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  /** Resolve (building if first call) the artifact path for `tag` over
    * testdata `dir`. `buildFn` writes the artifact under the path it is
    * given. */
  def ensure(tag: String, dir: String)(buildFn: String => Unit): String =
    fixtures.getOrElseUpdate(s"$tag:$dir", new LazyFixture(() => {
      val pid = ProcessHandle.current().pid()
      val slug = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(12)
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${pid}_$slug"
      val f = new java.io.File(path)
      if (f.exists()) rmTree(f) // stale from a failed earlier attempt
      Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(f)))
      buildFn(path)
      path
    })).value
}
