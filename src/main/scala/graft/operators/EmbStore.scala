package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted embedding near-dup artifact — TWO copy-on-write bucketed
  * tables maintained in lockstep:
  *  - bucket rows (vec_id, tbl, bucket), bucketed by bucket: the
  *    candidate-join side ([[SimilaritySearch.lshBucketRows]] output);
  *  - vector rows (vec_id, emb, nrm), bucketed by vec_id: the
  *    verification side ([[SimilaritySearch.normalizedVectors]] output
  *    — the double cast and the norm are paid once at ingest).
  * A probe ([[SimilaritySearch.incrementalLshNearDupPairsFromStore]])
  * then runs ZERO hyperplane math, zero casts and zero norms over the
  * seen corpus: candidate generation reads a pre-partitioned bucket
  * scan, verification a pre-partitioned vector scan. Completes the
  * store-backed incremental story on the vector side (text:
  * bloom/BandStore/SimhashStore; vectors: IvfStore for serving, this
  * for dedup). Maintenance is the shared copy-on-write version-publish
  * machinery ([[CopyOnWriteBucketedStore]]); both tables share one
  * replay guard via the same batchId passed to [[merge]].
  */
final class EmbStore(name: String, buckets: Int = 32) {

  private def requireLongId(df: DataFrame): Unit =
    require(df.schema("vec_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"EmbStore stores LONG vec ids, got " +
        s"${df.schema("vec_id").dataType.catalogString} — map ids to a " +
        "surrogate long (e.g. xxhash64) before bucketing")

  private def requireDoubleEmb(df: DataFrame): Unit = {
    val embType = df.schema("emb").dataType
    require(embType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      embType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType == org.apache.spark.sql.types.DoubleType,
      s"EmbStore stores array<double> embeddings " +
        s"(SimilaritySearch.normalizedVectors output), got " +
        s"${embType.catalogString}")
  }

  private val bucketStore =
    new CopyOnWriteBucketedStore(s"${name}_buckets", "bucket", buckets) {
      override protected def emptyTable(spark: SparkSession): DataFrame = {
        import spark.implicits._
        Seq.empty[(Long, Int, Long)].toDF("vec_id", "tbl", "bucket")
      }
      override protected def normalize(batch: DataFrame): DataFrame = {
        requireLongId(batch)
        batch.select(col("vec_id"), col("tbl"), col("bucket"))
      }
    }

  private val vecStore =
    new CopyOnWriteBucketedStore(s"${name}_vecs", "vec_id", buckets) {
      override protected def emptyTable(spark: SparkSession): DataFrame = {
        import spark.implicits._
        Seq.empty[(Long, Seq[Double], Double)].toDF("vec_id", "emb", "nrm")
      }
      override protected def normalize(batch: DataFrame): DataFrame = {
        requireLongId(batch)
        requireDoubleEmb(batch)
        batch.select(col("vec_id"), col("emb"), col("nrm"))
      }
    }

  /** Current bucket rows (vec_id, tbl, bucket). Empty before the first
    * merge. */
  def bucketRows(spark: SparkSession): DataFrame = bucketStore.table(spark)

  /** Current pre-normed vector rows (vec_id, emb, nrm). */
  def vectorRows(spark: SparkSession): DataFrame = vecStore.table(spark)

  /** Publish an ACCEPTED batch's artifacts (post-dedup survivors):
    * bucket rows and normalized vectors, under one batchId so an
    * at-least-once replay is a no-op on BOTH tables. Both batches are
    * schema-validated BEFORE either table is touched — a half-applied
    * merge would leave the candidate and verification sides
    * inconsistent. */
  def merge(batchBuckets: DataFrame, batchVectors: DataFrame,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = {
    requireLongId(batchBuckets)
    requireLongId(batchVectors)
    requireDoubleEmb(batchVectors)
    bucketStore.merge(batchBuckets, batchId)
    vecStore.merge(batchVectors, batchId)
  }
}
