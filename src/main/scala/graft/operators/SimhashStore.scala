package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted SimHash banded-fingerprint table — the
  * incrementally-maintained seen-side artifact
  * [[Dedup.incrementalSimhashFromStore]] probes. Completes the
  * store-backed incremental story across all three dedup families:
  * exact (bloom sketch), MinHash ([[BandStore]]), SimHash (this).
  *
  * The convenience incremental form re-derives seen-side fingerprints
  * on EVERY probe — for the md5 twin that is a token explode plus 60
  * vote aggregations per doc, repeated forever. This store persists
  * the (doc_id, simhash, band, band_val) rows once per ingested batch
  * instead: 4 rows × ~32 bytes per doc, no text, no tokens. The
  * fingerprint rides in the band rows, so the probe's hamming
  * verification needs no second corpus join at all — and bucketing by
  * band_val pre-partitions the candidate join's seen side (hash on
  * band_val satisfies the (band, band_val) clustering requirement).
  * Maintenance is the shared append-only segment machinery
  * ([[SegmentedBucketedStore]]).
  */
final class SimhashStore(name: String, buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "band_val", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Int, Long)]
      .toDF("doc_id", "simhash", "band", "band_val")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    // the store schema is (doc_id long, simhash long, band int,
    // band_val long) — Dedup.simhashBands/md5SimhashBands output. A
    // drifted id or fingerprint type would silently union-coerce and
    // break the probe join's resolution; fail loudly.
    require(batch.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"SimhashStore stores LONG doc ids, got " +
        s"${batch.schema("doc_id").dataType.catalogString} — map ids " +
        "to a surrogate long (e.g. xxhash64) before fingerprinting")
    require(batch.schema("simhash").dataType ==
      org.apache.spark.sql.types.LongType,
      s"SimhashStore stores LONG fingerprints, got " +
        s"${batch.schema("simhash").dataType.catalogString}")
    batch.select(col("doc_id"), col("simhash"), col("band"), col("band_val"))
  }
}
