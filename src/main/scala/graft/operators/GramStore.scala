package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Persisted token-window (gram) table — the incrementally-maintained
  * seen-side artifact [[Dedup.incrementalDuplicateSpansFrom]] probes.
  *
  * The convenience incremental form re-windows the seen corpus (one
  * md5 per token position) on EVERY probe — at corpus scale that is a
  * full seen-side scan+hash repeated forever. This store materializes
  * each ingested batch's DISTINCT (doc_id, gram) pairs instead: no
  * text, no positions, bucketed by gram so the probe's membership
  * semi-join reads the corpus side pre-partitioned. Carrying doc_id
  * (not a bare gram set) is what makes ingest-loop replays exact: a
  * probe can anti-join the batch's own ids back out of the seen view
  * ([[probe]]'s `excludeBatchIds`), the same contract as
  * [[BandStore]]/[[EmbStore]]. Maintenance is the shared append-only
  * segment machinery ([[SegmentedBucketedStore]]).
  *
  * `k` (window length in tokens) is part of the store's identity: a
  * table built at one k probed at another would silently detect
  * nothing — [[ingest]] and [[probe]] both window at the stored k.
  */
final class GramStore(name: String, val k: Int = Dedup.DupSpanTokens,
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
      s"GramStore stores LONG doc ids, got " +
        s"${batch.schema("doc_id").dataType.catalogString} — map ids " +
        "to a surrogate long (e.g. xxhash64) first")
    batch.select(col("doc_id"), col("gram"))
  }

  /** Publish an ACCEPTED batch's windows: distinct (doc_id, gram)
    * pairs at the store's k, under `batchId` so an at-least-once
    * replay is a no-op. */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit =
    merge(Dedup.spanGrams(docs, idCol, textCol, k)
      .select(col(idCol).as("doc_id"), col("gram")).distinct(), batchId)

  /** Incremental duplicated-span detection of a NEW batch against the
    * stored corpus at the store's k — the store-backed form of
    * [[Dedup.incrementalDuplicateSpansFrom]], identical output, zero
    * window/hash work over the seen side.
    *
    * `excludeBatchIds` makes an ingest loop replay-exact: on an
    * at-least-once REPLAY the batch's own (already-merged) grams would
    * otherwise mark every batch window as duplicated — anti-joining
    * the batch's ids out of the seen view restores the original run's
    * exact probe input. The broadcast anti-join keys on the batch's
    * ids only — the store side stays a bare pre-partitioned scan. */
  def probe(batch: DataFrame, idCol: String, textCol: String,
      excludeBatchIds: Boolean = false): DataFrame = {
    val spark = batch.sparkSession
    val seen =
      if (!excludeBatchIds) table(spark)
      else table(spark).join(
        broadcast(batch.select(col(idCol).cast("long").as("doc_id"))),
        Seq("doc_id"), "left_anti")
    Dedup.incrementalDuplicateSpansFrom(batch, seen, idCol, textCol, k)
  }
}
