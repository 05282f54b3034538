package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted IVF inverted file — the incrementally-maintained,
  * cell-assigned vector table [[IvfIndex.topKFromIndexed]] probes.
  *
  * The convenience [[IvfIndex.topK]] re-runs the cell assignment
  * (a centroid argmin per vector) over the WHOLE corpus on every
  * query batch — at serving scale that is the dominant cost, repeated
  * forever. This store materializes [[IvfIndex.index]]'s
  * (vec_id, emb, v_nrm, cell) rows once per ingested batch instead,
  * bucketed by cell, so a probe joins candidate cells against a bare
  * pre-partitioned scan: no assignment stage, no shuffle of the
  * corpus side. New vectors stream in through
  * [[graft.streaming.StreamingPipelines.annIngestBatch]]: assign the
  * batch (scan-side native expression), merge, done — the standard
  * "add to the inverted file" IVF maintenance, centroids frozen as of
  * training (faiss semantics; retrain is offline, applied with
  * [[rebuild]]). Maintenance is the shared append-only segment
  * machinery ([[SegmentedBucketedStore]]).
  */
final class IvfStore(name: String, buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "cell", buckets, pointer) {

  /** Re-assign the WHOLE inverted file under freshly-trained centroids —
    * the offline half of the faiss retrain story ([[IvfIndex.train]] on
    * a new corpus snapshot, then this). One scan-side native-expression
    * pass over the stored vectors (emb and v_nrm are already cast and
    * normed — only the cell argmin recomputes) into one fresh bucketed
    * segment, published atomically: probes read the old inverted file
    * until the pointer flips, and readers holding the prior manifest
    * keep their segments for a grace generation (IvfStoreSpec pins
    * mid-rebuild reader isolation and equality with a from-scratch
    * [[IvfIndex.index]]). The current-table snapshot is taken inside
    * the store lock (the thunk), so a concurrent streaming merge
    * serializes before or after the rebuild — never into a silently
    * dropped window. */
  def rebuild(spark: SparkSession, newCentroids: Seq[Seq[Double]]): Unit =
    replaceAllWith(spark, cur => cur
      .select(col("vec_id"), col("emb"), col("v_nrm"))
      .withColumn("cell",
        graft.functions.CentroidAssign(col("emb"), newCentroids)))

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Double], Double, Int)]
      .toDF("vec_id", "emb", "v_nrm", "cell")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    // the store schema is IvfIndex.index's output — (vec_id long,
    // emb array<double>, v_nrm double, cell int). A drifted vec_id
    // type would silently union-coerce and break the probe join's
    // resolution; a float emb would silently change every score's
    // arithmetic. Fail loudly on both.
    require(batch.schema("vec_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"IvfStore stores LONG vec ids, got " +
        s"${batch.schema("vec_id").dataType.catalogString} — map ids to " +
        "a surrogate long (e.g. xxhash64) before indexing")
    require(batch.schema("emb").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, false) ||
      batch.schema("emb").dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, true),
      s"IvfStore stores array<double> embeddings (IvfIndex.index " +
        s"output), got ${batch.schema("emb").dataType.catalogString}")
    batch.select(col("vec_id"), col("emb"), col("v_nrm"), col("cell"))
  }
}
