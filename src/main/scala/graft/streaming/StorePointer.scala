package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** The persisted stores' publish pointer, factored behind an interface
  * so the single-driver in-memory default and a restart-surviving file
  * pointer are the same code path — and so a cluster deployment can
  * drop in a catalog-backed impl (Delta/Iceberg table pointer, a
  * metastore property, ZooKeeper) without touching store logic.
  *
  * The payload is an opaque store-owned string (the store's encoded
  * manifest). The contract is atomicity of [[write]] against concurrent
  * [[read]]s: a reader sees either the old or the new payload in full,
  * never a torn mix — that single property is what makes the stores'
  * version publish atomic. Writer MUTUAL EXCLUSION stays the store's
  * job (merges are `synchronized` per store instance; foreachBatch
  * serializes micro-batches per query) — a pointer impl does not
  * arbitrate two drivers racing, it only publishes. A multi-driver
  * deployment needs a CAS-capable impl (the catalog seam).
  */
trait StorePointer {

  /** Current payload; None when nothing was ever published. */
  def read(): Option[String]

  /** Atomically replace the payload. */
  def write(payload: String): Unit
}

/** Default pointer: a volatile field — publish atomicity for free, JVM
  * lifetime, zero dependencies. The contract every store shipped with
  * before the seam existed. */
final class InMemoryPointer extends StorePointer {
  @volatile private var payload: Option[String] = None
  override def read(): Option[String] = payload
  override def write(p: String): Unit = payload = Some(p)
}

/** File-backed pointer: write-temp + atomic rename, the classic
  * single-file commit protocol. Atomicity comes from the filesystem's
  * rename guarantee (POSIX rename(2) within one directory), so a
  * concurrent reader sees the old or the new file, never a partial
  * write. Because the pointer file outlives the JVM, a store built on
  * it ADOPTS its surviving segments on restart
  * ([[graft.operators.SegmentedBucketedStore]] re-registers the
  * bucketed tables over the warehouse directories) — the in-memory
  * pointer's stores restart empty instead. */
final class FilePointer(path: Path) extends StorePointer {

  override def read(): Option[String] =
    if (Files.exists(path))
      Some(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
    else None

  override def write(p: String): Unit = {
    val dir = path.toAbsolutePath.getParent
    Files.createDirectories(dir)
    // temp file in the SAME directory: cross-directory rename loses the
    // atomic guarantee on most filesystems
    val tmp = Files.createTempFile(dir, path.getFileName.toString, ".tmp")
    try {
      Files.write(tmp, p.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }
}
