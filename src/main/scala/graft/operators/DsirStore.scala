package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted DSIR bucket-count model — the serving artifact behind
  * [[TextAnalysis.dsirSelect]]: the hashed-ngram (ct, cr) counts are
  * ADDITIVE over batches, so the store is the textbook mergeable-
  * aggregate LSM — each accepted batch appends its own partial model
  * (≤ `buckets` rows, O(batch) compute, O(buckets) bytes) and the
  * served model is the bucket-wise SUM of live segments. No other
  * store in the repo has this property (band/gram/vector rows are
  * per-document facts); counts are the cheapest possible incremental
  * state.
  *
  * [[compact]] is overridden to FOLD the partial counts — after a
  * compaction the table is ≤ `buckets` rows total, not a union of
  * per-batch partials, so the model read is a bare scan.
  *
  * Scoring reads the aggregated model (≤ `buckets` rows → broadcast)
  * and runs [[TextAnalysis.dsirRank]] — the EXACT tail the one-shot
  * form runs, so the store-backed selection cannot drift from the
  * recompute form (the `dsir_select_store` gate shares the oracle
  * verbatim). Replay/restart semantics are [[SegmentedBucketedStore]]'s
  * (batchId-idempotent merges, pointer-driven restart adoption).
  */
final class DsirStore(name: String,
    val buckets: Int = TextAnalysis.DsirBuckets,
    layoutBuckets: Int = 16,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "bucket", layoutBuckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("bucket", "ct", "cr")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    val sch = batch.schema
    require(Seq("bucket", "ct", "cr").forall(c => sch.fieldNames.contains(c)),
      s"DsirStore stores (bucket, ct, cr), got ${sch.catalogString}")
    batch.select(col("bucket"), col("ct"), col("cr"))
  }

  /** Publish an ACCEPTED batch's partial model under `batchId` —
    * at-least-once replays are no-ops; double-counting a batch would
    * silently bias every subsequent weight. */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit =
    merge(TextAnalysis.dsirModelOf(
      TextAnalysis.dsirTf(docs, idCol, textCol, isTarget, buckets)), batchId)

  /** The served model: bucket-wise sum of the live segments' partial
    * counts. ≤ `buckets` rows by construction — broadcastable. */
  def model(spark: SparkSession): DataFrame =
    table(spark).groupBy(col("bucket"))
      .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"))

  /** Rank `docs` against the PERSISTED model — zero model recompute;
    * the scoring tail is [[TextAnalysis.dsirRank]] verbatim. */
  def select(docs: DataFrame, idCol: String, textCol: String,
      topN: Int = TextAnalysis.DsirTopN): DataFrame =
    TextAnalysis.dsirRank(
      TextAnalysis.dsirTf(docs, idCol, textCol, lit(false), buckets)
        .drop("tgt"),
      model(docs.sparkSession), buckets, topN)

  /** Compaction folds the partials: the rewritten segment is the
    * AGGREGATED model (≤ `buckets` rows), not a concatenation of
    * per-batch rows — compaction shrinks this store instead of merely
    * re-clustering it. */
  override def compact(spark: SparkSession): Unit =
    if (liveSegments.size > 1)
      replaceAllWith(spark, t => t.groupBy(col("bucket"))
        .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr")))
}
