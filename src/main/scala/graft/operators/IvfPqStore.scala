package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted compressed inverted file — [[IvfPq.encode]]'s
  * (vec_id, codes, v_nrm, cell) rows under the shared append-only
  * segment machinery, bucketed by cell so
  * [[IvfPq.topKFromEncoded]] probes a bare pre-partitioned scan (no
  * assignment, no encoding at query time — both are paid once at
  * ingest). This is the artifact that actually realizes PQ's memory
  * win at scale: the stored table carries 4-bit codes and one norm
  * per vector, never the raw embeddings.
  *
  * Unlike [[IvfStore.rebuild]], re-quantization (new centroids OR new
  * codebooks) cannot run from the stored rows — codes are lossy, so a
  * rebuild must re-encode from the raw vector source-of-truth and
  * land in a fresh store generation. That is the faiss story too: the
  * compressed index is derived data; retraining re-derives it. */
final class IvfPqStore(name: String, buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "cell", buckets, pointer) {

  /** Re-derive the ENTIRE compressed index from the raw vector
    * source-of-truth under new artifacts — the offline retrain seam as
    * CODE: codes are lossy, so unlike [[IvfStore.rebuild]] this takes
    * `rawVectors` (the (vec_id, embedding) relation the codes were
    * derived from), re-encodes under the NEW centroids/codebooks, and
    * publishes atomically (one fresh segment; readers of the prior
    * manifest keep their grace-window segments — the
    * [[SegmentedBucketedStore.replaceAllWith]] semantics). Streaming
    * merges landing mid-rebuild are NOT in the rebuilt generation —
    * pause the ingest loop across a retrain, the same operational rule
    * faiss's retrain-and-reindex has. */
  def rebuildFrom(spark: SparkSession, rawVectors: DataFrame,
      centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]]): Unit =
    replaceAllWith(spark, _ => IvfPq.encode(rawVectors, centroids, codebooks))

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Int], Double, Int)]
      .toDF("vec_id", "codes", "v_nrm", "cell")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    require(batch.schema("vec_id").dataType == LongType,
      s"IvfPqStore stores LONG vec ids, got " +
        s"${batch.schema("vec_id").dataType.catalogString}")
    val codesOk = batch.schema("codes").dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    require(codesOk, s"IvfPqStore stores array<int> PQ codes, got " +
      s"${batch.schema("codes").dataType.catalogString}")
    batch.select(col("vec_id"), col("codes"), col("v_nrm"), col("cell"))
  }
}
