package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.Writers

/** Copy-on-write versioned bucketed parquet table — the shared
  * machinery behind every persisted ingest-side artifact
  * ([[BandStore]]'s band table, [[IvfStore]]'s cell-assigned vectors).
  *
  * Maintenance is CtrStore's version-publish pattern: read-version N,
  * write-version N+1 (current table ∪ accepted batch), publish by
  * bumping the pointer; versions are immutable once written and the
  * N−1 reader window is preserved. The union re-bucketing is one
  * shuffle of the store's narrow rows — the copy-on-write price; an
  * append-only bucketed table would amortize it further at the cost of
  * small-file compaction. On a cluster the same shape is a
  * Delta/Iceberg MERGE; versioned bucketed parquet keeps it
  * dependency-free here. Nothing ever collects to the driver.
  *
  * Bucketing by `bucketCol` means the probe-side join reads the store
  * pre-partitioned (the bucketed scan reports its hash partitioning to
  * Catalyst — the write-time shuffle is paid once, not per probe).
  */
private[graft] abstract class CopyOnWriteBucketedStore(
    name: String, bucketCol: String, buckets: Int) {

  // The publish pointer. Ingest batches are sequential per pipeline
  // (foreachBatch serializes batch N+1 behind batch N's merge), so a
  // volatile pointer suffices — same contract as CtrStore.
  @volatile private var version: Int = 0
  @volatile private var lastBatch: Long = Long.MinValue

  private def tableName(v: Int): String = s"${name}_v$v"

  /** The store's (empty) schema, used before the first merge. */
  protected def emptyTable(spark: SparkSession): DataFrame

  /** Validate an incoming batch against the store schema (fail loudly
    * on a drift that would silently union-coerce) and project it to
    * exactly the stored columns. */
  protected def normalize(batch: DataFrame): DataFrame

  /** Current store table. Empty before the first merge. */
  def table(spark: SparkSession): DataFrame =
    if (version == 0) emptyTable(spark) else spark.table(tableName(version))

  /** True when `batchId` was already merged — [[merge]] would no-op.
    * Lets a foreachBatch body skip the batch-artifact computation (and
    * any eager checkpoint of it) entirely on an at-least-once replay. */
  def isReplay(batchId: Long): Boolean =
    batchId != graft.streaming.VersionedParquetStore.NoBatchId &&
      batchId <= lastBatch

  /** Publish an accepted batch: current ∪ batch → new bucketed version.
    *
    * Pass the foreachBatch `batchId` when merging from a stream: replay
    * of an at-least-once micro-batch is then a no-op — duplicated rows
    * would corrupt downstream counts (e.g. doubled band-bucket counts
    * spuriously tripping the dedup cap). The sentinel is the SHARED
    * [[graft.streaming.VersionedParquetStore.NoBatchId]] — one
    * definition for every store's replay guard. */
  def merge(batch: DataFrame,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = synchronized {
    if (isReplay(batchId)) return
    val spark = batch.sparkSession
    val next = version + 1
    val rows = table(spark).unionByName(normalize(batch))
    // a previous JVM's managed-table directory can survive as an orphan
    // (the in-memory catalog dies with its session; the warehouse dir
    // does not), and saveAsTable refuses an existing location it has no
    // catalog entry for — clear both before writing this version
    dropVersion(spark, next)
    Writers.bucketedTable(rows, tableName(next), bucketCol, buckets)
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
