package graft.sideline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Durable store for sideline lifecycle state — the reference's
 * sideline/persistence/PersistenceAdapter.java:47-98 (persist/retrieve/
 * list/clear sideline requests) with the ZK implementation
 * (sideline/persistence/ZookeeperPersistenceAdapter.java:129-224) replaced
 * by a filesystem control directory: one JSON document per request, written
 * atomically via temp-file + rename. On a cluster this directory lives on
 * shared storage (HDFS/S3 via a different impl of the same trait); the
 * state is a handful of control rows, never data-sized.
 */
trait ControlStore {
  def persist(payload: SidelinePayload): Unit
  def retrieve(id: String): Option[SidelinePayload]
  def list(): Seq[SidelinePayload]
  def clear(id: String): Unit
}

final class FileControlStore(dir: String) extends ControlStore {
  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    p
  }

  private def fileFor(id: String): Path = {
    require(id.matches("[A-Za-z0-9._-]+"), s"unsafe sideline id: $id")
    root.resolve(s"$id.json")
  }

  override def persist(payload: SidelinePayload): Unit = synchronized {
    val target = fileFor(payload.id)
    val tmp = root.resolve(s".${payload.id}.tmp")
    Files.writeString(tmp, payload.toJson)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def retrieve(id: String): Option[SidelinePayload] = synchronized {
    val f = fileFor(id)
    if (Files.exists(f)) Some(SidelinePayload.fromJson(Files.readString(f)))
    else None
  }

  override def list(): Seq[SidelinePayload] = synchronized {
    if (!Files.exists(root)) Seq.empty
    else {
      // Files.list holds an open directory handle until closed; this runs
      // per micro-batch, so close it eagerly instead of waiting for GC
      val stream = Files.list(root)
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".json"))
        .map(p => SidelinePayload.fromJson(Files.readString(p)))
        .toSeq.sortBy(_.id)
      finally stream.close()
    }
  }

  override def clear(id: String): Unit = synchronized {
    Files.deleteIfExists(fileFor(id))
  }
}

/** Heap-backed store for unit tests (reference InMemoryPersistenceAdapter). */
final class InMemoryControlStore extends ControlStore {
  private val map = scala.collection.concurrent.TrieMap.empty[String, SidelinePayload]
  override def persist(payload: SidelinePayload): Unit = map.put(payload.id, payload)
  override def retrieve(id: String): Option[SidelinePayload] = map.get(id)
  override def list(): Seq[SidelinePayload] = map.values.toSeq.sortBy(_.id)
  override def clear(id: String): Unit = map.remove(id)
}
