package graft.metrics

import scala.jdk.CollectionConverters._

/**
 * Host contention snapshot shared by the timing harnesses ([[graft.Bench]],
 * [[graft.ScaleReport]]): wall-clock numbers from a contended host do not
 * reflect the build (the r15 bench lesson — a concurrent 32-thread JVM
 * inflates totals 3-6×), so every timing artifact records the start
 * loadavg and the FOREIGN JVM count. Ancestor JVMs (the sbt process that
 * forked this run) are excluded: they are part of this invocation, not
 * foreign load.
 */
object HostLoad {

  /** (1-minute loadavg, foreign JVM count). */
  def state(): (Double, Int) = {
    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case _: Exception => -1.0 }
    val lineage = Iterator.iterate(Option(ProcessHandle.current())) {
      _.flatMap(h => Option(h.parent().orElse(null)))
    }.takeWhile(_.isDefined).take(16).flatten.map(_.pid()).toSet
    val otherJvms = ProcessHandle.allProcesses().iterator().asScala.count { p =>
      !lineage.contains(p.pid()) &&
        p.info().command().map[Boolean](_.contains("java")).orElse(false)
    }
    (loadavg, otherJvms)
  }

  /** The r14-judge contention bar: loadavg above 0.15×cores at start, or
    * ANY foreign JVM. */
  def contended(cores: Int, loadavg: Double, otherJvms: Int): Boolean =
    loadavg > 0.15 * cores || otherJvms > 0
}
