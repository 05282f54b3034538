package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sinks.Writers

/** Persisted MinHash band table — the incrementally-maintained seen-side
  * artifact [[Dedup.incrementalMinhashLshMd5FromStore]] probes.
  *
  * The convenience incremental form recomputes seen-side signatures
  * (k digests/minima per doc) from raw text on EVERY probe — at corpus
  * scale that is the dominant per-batch cost, repeated forever. This
  * store materializes the (doc_id, band, band_key) rows once per
  * ingested batch instead: ~24 bytes × bands per doc, no text, no
  * shingles, bucketed by band_key so the probe's candidate join reads
  * the corpus side pre-partitioned (the bucketed scan reports its hash
  * partitioning to Catalyst — the write-time shuffle is paid once, not
  * per probe).
  *
  * Maintenance is CtrStore's copy-on-write version-publish pattern:
  * read-version N, write-version N+1 (current table ∪ accepted batch's
  * bands, [[Dedup.md5Bands]]), publish by bumping the pointer; versions
  * are immutable once written and the N−1 reader window is preserved.
  * On a cluster the same shape is a Delta/Iceberg MERGE or an
  * append-only bucketed table with periodic compaction; versioned
  * bucketed parquet keeps it dependency-free here. Nothing ever
  * collects to the driver.
  */
final class BandStore(name: String, buckets: Int = 32) {

  // The publish pointer. Ingest batches are sequential per pipeline
  // (foreachBatch serializes batch N+1 behind batch N's merge), so a
  // volatile pointer suffices — same contract as CtrStore.
  @volatile private var version: Int = 0
  @volatile private var lastBatch: Long = Long.MinValue

  private def tableName(v: Int): String = s"${name}_v$v"

  /** Current band table: (doc_id, band, band_key). Empty before the
    * first merge. */
  def table(spark: SparkSession): DataFrame =
    if (version == 0) {
      import spark.implicits._
      Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "band_key")
    } else spark.table(tableName(version))

  /** Publish an ACCEPTED batch's bands (post-dedup survivors,
    * [[Dedup.md5Bands]] output): current ∪ batch → new bucketed
    * version. The union re-bucketing is one shuffle of 24-byte rows —
    * the copy-on-write price; an append-only bucketed table would
    * amortize it further at the cost of small-file compaction.
    *
    * Pass the foreachBatch `batchId` when merging from a stream: replay
    * of an at-least-once micro-batch is then a no-op — duplicated band
    * rows would double bucket counts and spuriously drop buckets over
    * maxBucketSize/2 (silently missed near-dups). The sentinel is the
    * SHARED [[graft.streaming.VersionedParquetStore.NoBatchId]] — one
    * definition for every store's replay guard. */
  def merge(batchBanded: DataFrame,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = synchronized {
    if (batchId != graft.streaming.VersionedParquetStore.NoBatchId &&
      batchId <= lastBatch) return
    // the store schema is (doc_id long, band int, band_key string) —
    // a differently-typed id column would silently union-coerce and
    // break the probe join's type resolution downstream; fail loudly
    // (map non-numeric ids to a surrogate long, e.g. xxhash64, first)
    require(batchBanded.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"BandStore stores LONG doc ids, got " +
        s"${batchBanded.schema("doc_id").dataType.catalogString} — map ids " +
        "to a surrogate long (e.g. xxhash64) before banding")
    val spark = batchBanded.sparkSession
    val next = version + 1
    val rows = table(spark)
      .unionByName(batchBanded.select(
        col("doc_id"), col("band"), col("band_key")))
    // a previous JVM's managed-table directory can survive as an orphan
    // (the in-memory catalog dies with its session; the warehouse dir
    // does not), and saveAsTable refuses an existing location it has no
    // catalog entry for — clear both before writing this version
    dropVersion(spark, next)
    Writers.bucketedTable(rows, tableName(next), "band_key", buckets)
    version = next
    if (batchId != graft.streaming.VersionedParquetStore.NoBatchId)
      lastBatch = batchId
    // retire versions older than the previous one (kept for any
    // in-flight reader of N-1)
    if (next >= 2) dropVersion(spark, next - 2)
  }

  private def dropVersion(spark: SparkSession, v: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(v)}")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(warehouse,
      tableName(v).toLowerCase(java.util.Locale.ROOT))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }
}
