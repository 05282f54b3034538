package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted MinHash band table — the incrementally-maintained seen-side
  * artifact [[Dedup.incrementalMinhashLshMd5FromStore]] probes.
  *
  * The convenience incremental form recomputes seen-side signatures
  * (k digests/minima per doc) from raw text on EVERY probe — at corpus
  * scale that is the dominant per-batch cost, repeated forever. This
  * store materializes the (doc_id, band, band_key) rows once per
  * ingested batch instead: ~24 bytes × bands per doc, no text, no
  * shingles, bucketed by band_key so the probe's candidate join reads
  * the corpus side pre-partitioned. Maintenance is the shared
  * append-only segment machinery ([[SegmentedBucketedStore]]): each
  * merge writes only the batch's band rows; [[compact]] periodically
  * folds segments back to the single bare bucketed scan.
  */
final class BandStore(name: String, buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "band_key", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "band_key")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    // the store schema is (doc_id long, band int, band_key string) —
    // a differently-typed id column would silently union-coerce and
    // break the probe join's type resolution downstream; fail loudly
    // (map non-numeric ids to a surrogate long, e.g. xxhash64, first)
    require(batch.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"BandStore stores LONG doc ids, got " +
        s"${batch.schema("doc_id").dataType.catalogString} — map ids " +
        "to a surrogate long (e.g. xxhash64) before banding")
    batch.select(col("doc_id"), col("band"), col("band_key"))
  }
}
