package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/**
 * Keeps config code and config docs in lockstep — the role the
 * reference's build-time DocGenerator plays for its README tables
 * (documentation/DocGenerator.java): a key added to GraftConfig without
 * documentation, a documented key that no code reads, or a stale
 * committed CONFIGURATION.md all fail here.
 */
class ConfigDocsSuite extends AnyFunSuite {

  private def sourceKeys: Set[String] = {
    val src = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "src/main/scala/graft/engine/GraftConfig.scala"))
    // every get/getInt/getLong/getDouble("key", ...) literal
    """get(?:Int|Long|Double)?\("([a-z0-9_.]+)"""".r
      .findAllMatchIn(src).map(_.group(1)).toSet
  }

  test("every key GraftConfig reads is documented, and vice versa") {
    val documented = ConfigDocs.entries.map(_.key).toSet
    val read = sourceKeys
    assert(read.diff(documented).isEmpty,
      s"keys read by GraftConfig but undocumented: ${read.diff(documented)}")
    assert(documented.diff(read).isEmpty,
      s"documented keys no code reads: ${documented.diff(read)}")
  }

  test("committed docs/CONFIGURATION.md matches the generator output") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("docs/CONFIGURATION.md"))
    assert(committed == ConfigDocs.markdown,
      "docs/CONFIGURATION.md is stale — run " +
        "`sbt \"runMain graft.engine.ConfigDocs\"`")
  }

  test("rendered markdown has one table row per entry") {
    val md = ConfigDocs.markdown
    for (e <- ConfigDocs.entries)
      assert(md.contains(s"| `${e.key}` |"), s"missing row for ${e.key}")
  }
}
