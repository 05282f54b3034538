package graft.operators

import graft.operators.Materialize.MatOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Persisted banded media-fingerprint table — dedup-at-ingest for the
  * MULTIMODAL columns, completing the store-backed incremental story
  * across every modality: exact text (bloom), MinHash/SimHash text
  * bands, embedding buckets ([[EmbStore]]), semantic cells
  * ([[IvfStore]]), and now perceptual hashes (image aHash / audio
  * energy-hash — any (asset_id, hash_hi, hash_lo) source).
  *
  * The [[SimhashStore]] design, verbatim: 4 band rows × ~40 bytes per
  * asset, the 64-bit hash RIDING in each band row so the probe's
  * popcount verification never joins back to a second corpus table;
  * bucketed by band value, so the candidate join reads the seen side
  * pre-partitioned. The expensive step — real codec decode + hashing —
  * is paid ONCE at ingest; probes do zero decode work over the seen
  * corpus. Maintenance is the shared append-only segment machinery.
  */
final class MediaHashStore(name: String, buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "bv", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Int, Long)]
      .toDF("asset_id", "hash_hi", "hash_lo", "band", "bv")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    require(batch.schema("asset_id").dataType == LongType,
      s"MediaHashStore stores LONG asset ids, got " +
        s"${batch.schema("asset_id").dataType.catalogString}")
    Seq("hash_hi", "hash_lo", "bv").foreach { c =>
      require(batch.schema(c).dataType == LongType,
        s"MediaHashStore stores LONG $c, got " +
          s"${batch.schema(c).dataType.catalogString}")
    }
    batch.select(col("asset_id"), col("hash_hi"), col("hash_lo"),
      col("band"), col("bv"))
  }

  /** Publish an ACCEPTED batch's banded hash rows under `batchId` —
    * [[Multimodal.hashBandRows]], the same banding the inline pair
    * search uses. */
  def ingest(hashes: DataFrame,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit =
    merge(Multimodal.hashBandRows(hashes), batchId)

  /** Incremental hamming near-dup pairs of a NEW batch of hashes
    * against the stored corpus — zero decode/banding work over the
    * seen side. `excludeBatchIds` makes an ingest loop replay-exact
    * (the batch's own previously-merged rows are anti-joined out of
    * the seen view, restoring the original probe input). */
  def probe(batchHashes: DataFrame, maxDist: Int = Multimodal.AHashMaxDist,
      maxBucketSize: Int = Multimodal.AHashMaxBucketSize,
      excludeBatchIds: Boolean = false): DataFrame = {
    val spark = batchHashes.sparkSession
    // one lazy checkpoint shared by every consumer of the batch side
    // (bands, union, verification, exclude list) — without it each
    // re-runs the decode+hash mapPartitions
    val bh = batchHashes.seamCheckpoint(false)
    val seen =
      if (!excludeBatchIds) table(spark)
      else table(spark).join(
        broadcast(bh.select(col("asset_id"))),
        Seq("asset_id"), "left_anti")
    Multimodal.incrementalHammingPairsChk(bh, seen, maxDist,
      maxBucketSize)
  }
}
