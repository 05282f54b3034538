package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Persisted winnowing-fingerprint table — the incrementally-maintained
  * seen-side artifact [[Dedup.incrementalWinnowPairsFrom]] probes.
  *
  * The convenience incremental form re-winnows the seen corpus (gram
  * hash + per-doc window minimum + rightmost-tie selection) on EVERY
  * probe — at corpus scale a full seen-side scan repeated forever, and
  * the winnowing sketch is exactly the artifact worth keeping: ~2/(w+1)
  * the size of the full gram table a [[GramStore]] holds. This store
  * materializes each ingested batch's DISTINCT selected (doc_id, gram)
  * types, bucketed by gram so the probe's candidate join reads the
  * corpus side pre-partitioned. Carrying doc_id keeps ingest-loop
  * replays exact: a probe anti-joins the batch's own ids out of the
  * seen view ([[probe]]'s `excludeBatchIds`), the same contract as
  * [[BandStore]]/[[GramStore]]. Maintenance is the shared append-only
  * segment machinery ([[SegmentedBucketedStore]]).
  *
  * `k` (gram tokens) and `w` (window size) are part of the store's
  * identity: fingerprints selected at one (k, w) probed at another
  * would silently detect nothing — [[ingest]] and [[probe]] both run
  * at the stored parameters.
  */
final class WinnowStore(name: String,
    val k: Int = Dedup.WinnowGramTokens,
    val w: Int = Dedup.WinnowWindow,
    buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "gram", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "gram")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    require(batch.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"WinnowStore stores LONG doc ids, got " +
        s"${batch.schema("doc_id").dataType.catalogString} — map ids " +
        "to a surrogate long (e.g. xxhash64) first")
    batch.select(col("doc_id"), col("gram"))
  }

  /** Publish an ACCEPTED batch's sketch: distinct selected (doc_id,
    * gram) types at the store's (k, w), under `batchId` so an
    * at-least-once replay is a no-op. */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit =
    merge(Dedup.winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("doc_id"), col("gram")).distinct(), batchId)

  /** Incremental shared-fingerprint pairing of a NEW batch against the
    * stored corpus at the store's (k, w) — the store-backed form of
    * [[Dedup.incrementalWinnowPairs]], identical output, zero
    * winnowing work over the seen side.
    *
    * `excludeBatchIds` makes an ingest loop replay-exact: on an
    * at-least-once REPLAY the batch's own (already-merged)
    * fingerprints would otherwise pair every batch doc with itself's
    * stored sketch — anti-joining the batch ids out of the seen view
    * restores the original run's exact probe input. */
  def probe(batch: DataFrame, idCol: String, textCol: String,
      excludeBatchIds: Boolean = false): DataFrame = {
    val spark = batch.sparkSession
    val seen =
      if (!excludeBatchIds) table(spark)
      else table(spark).join(
        broadcast(batch.select(col(idCol).cast("long").as("doc_id"))),
        Seq("doc_id"), "left_anti")
    Dedup.incrementalWinnowPairsFrom(batch, seen, idCol, textCol, k, w)
  }
}
