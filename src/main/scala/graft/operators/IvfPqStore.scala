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
