package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

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

/** A [[StorePointer]] whose publish can ARBITRATE between racing
  * writers: `compareAndSwap` succeeds iff the pointer still holds the
  * payload the writer based its update on. This is the multi-driver
  * contract the plain pointer explicitly does not give (two drivers
  * racing `write` is last-writer-wins — the loser's merge silently
  * vanishes from the published manifest); a store driving publishes
  * through CAS retries from the fresh payload instead, so no merge is
  * ever lost. Catalog-backed deployments map this onto their native
  * conditional write (Delta/Iceberg commit, metastore CAS property,
  * ZooKeeper versioned setData). */
trait CasStorePointer extends StorePointer {

  /** Atomically publish `payload` iff the current payload equals
    * `expect` (None = nothing ever published). False = another writer
    * got there first — re-read and retry. */
  def compareAndSwap(expect: Option[String], payload: String): Boolean
}

/** CAS pointer over an [[java.util.concurrent.atomic.AtomicReference]]
  * — the in-memory default's multi-writer-safe sibling (two ingest
  * loops in ONE driver sharing a store already serialize on the
  * store's merge lock; this impl exists so the contention specs can
  * pin the CAS contract without a filesystem). */
final class InMemoryCasPointer extends CasStorePointer {
  private val ref =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)
  override def read(): Option[String] = ref.get()
  override def write(p: String): Unit = ref.set(Some(p))
  override def compareAndSwap(expect: Option[String], p: String): Boolean = {
    val cur = ref.get()
    cur == expect && ref.compareAndSet(cur, Some(p))
  }
}

/** File-backed CAS pointer: generation-numbered payload files
  * published via the hard-link trick — write the payload to a temp
  * file, then `link(2)` it to `gen-%020d`. The link syscall BOTH
  * arbitrates (EEXIST exactly when another writer claimed that
  * generation first — O_EXCL-grade atomicity) AND publishes the full
  * content in one step (the temp was completely written before the
  * link, so a reader never sees a torn payload — the failure mode a
  * createFile-then-write protocol has). No claim/lock files means no
  * orphaned-claim livelock: a writer crashing before the link leaves
  * nothing; after the link it has fully published.
  *
  * `read` returns the highest generation present. `write` is the
  * unconditional retry loop (always lands, fresh generation);
  * `compareAndSwap` verifies the current generation's payload still
  * equals `expect` and claims exactly generation+1 — two writers
  * racing from the same observed state contend on the SAME target
  * name, so exactly one wins. Old generations beyond `keepGens` are
  * pruned after each successful publish (bounded directory; a few are
  * kept so an in-flight reader of generation N survives a concurrent
  * publish of N+1). Restart adoption works like [[FilePointer]]: the
  * generation files outlive the JVM. */
final class CasFilePointer(dir: Path, keepGens: Int = 8)
    extends CasStorePointer {
  require(keepGens >= 1, s"keepGens must be >= 1, got $keepGens")

  private val Gen = "gen-(\\d{20})".r

  private def generations(): Seq[Long] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
        case Gen(n) => Some(n.toLong)
        case _ => None
      }).toSeq.sorted
      finally s.close()
    }

  private def genPath(n: Long): Path = dir.resolve(f"gen-$n%020d")

  /** None when the generation vanished between the directory listing
    * and the read — a concurrent publisher's [[prune]] deleted it (a
    * reader lagging more than `keepGens` publishes). A benign race:
    * callers re-list, they never see a torn payload. */
  private def payloadOf(n: Long): Option[String] =
    try Some(new String(Files.readAllBytes(genPath(n)),
      StandardCharsets.UTF_8))
    catch { case _: java.nio.file.NoSuchFileException => None }

  @annotation.tailrec
  override final def read(): Option[String] =
    generations().lastOption match {
      case None => None
      case Some(n) => payloadOf(n) match {
        case Some(p) => Some(p)
        case None => read() // pruned under us — re-list
      }
    }

  /** Claim generation `n` with `payload`; false iff another writer
    * already holds it. */
  private def tryPublish(n: Long, payload: String): Boolean = {
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, "gen", ".tmp")
    try {
      Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
      try { Files.createLink(genPath(n), tmp); prune(n); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  private def prune(latest: Long): Unit =
    generations().filter(_ <= latest - keepGens)
      .foreach(n => Files.deleteIfExists(genPath(n)))

  override def write(p: String): Unit = {
    var done = false
    while (!done) {
      val next = generations().lastOption.getOrElse(-1L) + 1L
      done = tryPublish(next, p)
    }
  }

  override def compareAndSwap(expect: Option[String], p: String): Boolean =
    generations().lastOption match {
      case None => expect.isEmpty && tryPublish(0L, p)
      case Some(n) => payloadOf(n) match {
        // generation n pruned under us: newer generations exist (prune
        // only runs behind a successful publish), so this observation
        // is stale by definition — report failure, the caller re-reads
        case None => false
        case Some(cur) => expect.contains(cur) && tryPublish(n + 1L, p)
      }
    }
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
