package graft.streaming

import java.nio.file.{Files, Paths}

/** Copy-on-write versioned-parquet publish machinery, shared by the
  * JVM-scoped merge stores ([[CtrStore]]'s KTable target,
  * [[QualityFloorStore]]'s histogram): read-version N, write-version
  * N+1, flip a volatile pointer, retire versions older than N−1 (the
  * in-flight reader window). At cluster scale the same shape is a
  * Delta/Iceberg MERGE; versioned parquet keeps it dependency-free
  * here. Extracting it once keeps the three behaviors that matter —
  * publish atomicity, the reader window, replay skipping — in ONE
  * place instead of diverging copies.
  *
  * Replay idempotency: foreachBatch is at-least-once — after a sink
  * failure or a restart from checkpoint, a micro-batch can re-execute
  * with the SAME batchId. [[publish]] skips batch ids at or below the
  * last applied one, so a replayed merge is a no-op instead of a
  * double count (histogram mass, KTable increments, band rows would
  * all silently corrupt otherwise). Pass [[VersionedParquetStore.NoBatchId]]
  * for non-streaming callers that manage their own dedup.
  */
private[graft] final class VersionedParquetStore(dir: String) {

  @volatile private var version: Int = 0
  @volatile private var lastBatch: Long = Long.MinValue

  private def versionDir(v: Int): String = s"$dir/v$v"

  /** Directory of the current published version; None before the first
    * publish. */
  def current: Option[String] =
    if (version == 0) None else Some(versionDir(version))

  /** True when `batchId` was already applied — [[publish]] would no-op.
    * Lets a caller skip computing the batch artifact entirely on an
    * at-least-once replay instead of paying the (often dominant)
    * artifact computation just to have the publish skipped. */
  def isReplay(batchId: Long): Boolean =
    batchId != VersionedParquetStore.NoBatchId && batchId <= lastBatch

  /** Write the next version via `write(nextDir)` and flip the pointer —
    * unless `batchId` was already applied (replay → no-op). Returns
    * whether the publish was applied. Synchronized: foreachBatch
    * serializes merges per query, but nothing stops two queries from
    * sharing a store. */
  def publish(batchId: Long)(write: String => Unit): Boolean = synchronized {
    if (batchId != VersionedParquetStore.NoBatchId && batchId <= lastBatch) false
    else {
      val next = version + 1
      write(versionDir(next))
      version = next
      if (batchId != VersionedParquetStore.NoBatchId) lastBatch = batchId
      retire(next - 2)
      true
    }
  }

  // retire a stale version directory (kept one behind for readers)
  private def retire(v: Int): Unit = {
    val stale = Paths.get(versionDir(v))
    if (v >= 1 && Files.exists(stale)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(stale)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}

private[graft] object VersionedParquetStore {
  /** Sentinel for callers outside a replayable stream. */
  val NoBatchId: Long = Long.MinValue
}
