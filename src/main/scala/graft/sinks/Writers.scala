package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

/** Write-path surface: partitioned/compacted batch parquet, bucketed
  * tables for shuffle-free downstream joins, and streaming file sinks.
  *
  * Scale rationale:
  * - `partitionedParquet`: directory partitioning on low-cardinality
  *   keys gives partition pruning to every downstream reader;
  *   `targetFileParallelism` repartitions BY THE PARTITION COLUMNS
  *   first so each directory gets few, large files instead of
  *   (input-partitions × directories) small ones — the classic
  *   small-files failure at 100 TB.
  * - `bucketedTable`: pre-shuffles once at write time; subsequent joins
  *   or aggregations on the bucket key skip their Exchange entirely
  *   (bucketed scan reports the hash partitioning to Catalyst).
  * - `streamingParquet`: exactly-once file sink via checkpoint +
  *   manifest commit protocol.
  */
object Writers {

  /** Default: repartition by the partition columns at the session's
    * shuffle parallelism — directories write in parallel, each getting
    * few large files. Pass `targetFileParallelism` only to force a
    * specific task count (e.g. 1 for a tiny dimension snapshot); a hot
    * partition value still pins its directory to one task — salt or
    * `maxRecordsPerFile` for that case. */
  def partitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String],
      targetFileParallelism: Option[Int] = None): Unit =
    partitioned(df, path, partitionCols, targetFileParallelism, "parquet")

  private def partitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], targetFileParallelism: Option[Int],
      format: String): Unit = {
    val repartitioned = targetFileParallelism match {
      case Some(n) => df.repartition(n, partitionCols.map(col): _*)
      case None => df.repartition(partitionCols.map(col): _*)
    }
    repartitioned
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)
  }

  /** Pass `path` to create the table EXTERNAL at that location: the
    * data then survives a DROP TABLE / catalog death, which is what
    * lets [[graft.operators.SegmentedBucketedStore]] re-adopt its
    * segments on a new JVM (a managed table's drop deletes the files). */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def streamingParquet(df: DataFrame, path: String,
      checkpointLocation: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointLocation)

  /** Materialize a training layout ([[graft.operators.TextAnalysis
    * .packSequences]]/[[graft.operators.TextAnalysis.packSequencesPadded]]
    * output, or anything carrying `shard` + `pos`) as one directory per
    * shard whose files hold rows in `pos` ORDER — the property a
    * sequential training reader needs: it streams each shard file
    * start-to-finish and sees the token stream in layout order, no
    * sort at read time.
    *
    * How the order survives: the explicit repartition puts each shard
    * wholly in ONE task (hash partitioning never splits a key) and the
    * within-partition sort's (shard, pos) prefix satisfies the
    * partition-column ordering FileFormatWriter would otherwise insert
    * its own sort for — rows therefore reach each shard's file in
    * exactly the sorted order, one writer task per shard directory.
    * Parallelism = number of shards, the same unit the layout
    * operators parallelize over; pick nShards accordingly upstream
    * (a mega-shard would pin one writer task regardless). */
  def trainingShards(packed: DataFrame, path: String): Unit =
    packed.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)

  /** Z-ordered corpus layout: documents written sorted by the Morton
    * z value within shard directories ([[graft.operators.TextAnalysis
    * .layoutZorder]] assigns `shard` = top z bits and `zval`), so
    * parquet row-group min/max statistics are TIGHT on BOTH clustered
    * dimensions — a reader filtering on a quality range OR a length
    * range skips most row groups, where a single-column sort clusters
    * one dim and scatters the other. Same order-survival mechanics as
    * [[trainingShards]]: one task per shard (hash partitioning never
    * splits a key), within-partition sort prefixed by the partition
    * column, so rows land in each shard file in z order. This is the
    * one unavoidable range shuffle of a re-layout; the assignment
    * itself was scan-side. */
  def zorderedShards(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    graft.operators.TextAnalysis.layoutZorder(docs, idCol, textCol)
      .join(docs, Seq(idCol))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("zval"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)

  /** ORC variant of [[partitionedParquet]] for pipelines standardized
    * on ORC (Spark's reader/writer are native and columnar either way;
    * predicate pushdown and column pruning work identically — pinned in
    * WritersSpec). Same small-files-safe repartition-by-partition-cols
    * layout. */
  def partitionedOrc(df: DataFrame, path: String,
      partitionCols: Seq[String],
      targetFileParallelism: Option[Int] = None): Unit =
    partitioned(df, path, partitionCols, targetFileParallelism, "orc")
}
