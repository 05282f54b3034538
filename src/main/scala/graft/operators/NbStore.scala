package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted Naive-Bayes training state — the serving artifact behind
  * [[NbClassifier]]: what accumulates across ingest batches is the
  * sufficient-statistics relation (label, bucket, c) — counts are
  * ADDITIVE over batches (the [[DsirStore]] mergeable-aggregate
  * property; [[NbClassifier.stats]]' contract), so each accepted batch
  * appends its own ≤ 2·dim + 2 partial rows and the model is DERIVED
  * from the summed counts on demand. Because [[NbClassifier.modelOf]]
  * is a deterministic pure function of the summed counts, a store fed
  * the corpus in any batch split yields the IDENTICAL model to
  * one-shot training — the `classifier_score_store` gate shares
  * `classifier_score`'s oracle verbatim on exactly that argument.
  *
  * Scale shape: ingest reduces each batch scan-side to its bounded
  * partial counts before touching the store; derivation collects the
  * ≤ 2·dim + 2 summed rows and computes logs driver-local (the ONLY
  * driver-side work, bounded by dim — corpus documents never leave the
  * executors). [[compact]] folds partials so the table stays one row
  * per (label, bucket). Replay / restart semantics are
  * [[SegmentedBucketedStore]]'s (batchId-idempotent merges,
  * pointer-driven restart adoption).
  */
final class NbStore(name: String, val dim: Int = NbClassifier.Dim,
    layoutBuckets: Int = 16,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer,
    val bigram: Boolean = false)
    extends SegmentedBucketedStore(name, "bucket", layoutBuckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("label", "bucket", "c")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    val sch = batch.schema
    require(Seq("label", "bucket", "c").forall(sch.fieldNames.contains),
      s"NbStore stores (label, bucket, c), got ${sch.catalogString}")
    // explicit casts, not trust: an int-typed count from a literal-1
    // batch would otherwise write int32 pages under the long-typed
    // catalog table and fail far from the faulty merge
    batch.select(col("label").cast("long").as("label"),
      col("bucket").cast("long").as("bucket"),
      col("c").cast("long").as("c"))
  }

  /** Publish an accepted batch's partial sufficient statistics under
    * `batchId` (at-least-once replays no-op — double-counted buckets
    * would shift every trained weight). The store's `bigram` flag picks
    * the feature space ONCE at construction — ingest and every scorer
    * derived from [[model]] dispatch on it together, so a store can
    * never mix unigram-only and unigram+bigram counts (the two spaces
    * share the bucket domain; mixed counts would be silently wrong,
    * not loudly shaped wrong). */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit =
    merge(
      if (bigram) NbClassifier.statsBigram(docs, idCol, textCol, dim)
      else NbClassifier.stats(docs, idCol, textCol, dim), batchId)

  /** The exact integer log-odds under the store's OWN feature space —
    * the single gate expression every consumer must use, so a
    * bigram-trained store can never be scored with the unigram-only
    * walker (same weights, wrong features — plausible scores, silent
    * drift). */
  def rawScoreExprOf(text: org.apache.spark.sql.Column,
      m: NbClassifier.Model): org.apache.spark.sql.Column =
    if (bigram) NbClassifier.rawScoreBigramExpr(text, m)
    else NbClassifier.rawScoreExpr(text, m)

  /** Rounded-score twin of [[rawScoreExprOf]]. */
  def scoreExprOf(text: org.apache.spark.sql.Column,
      m: NbClassifier.Model): org.apache.spark.sql.Column =
    if (bigram) NbClassifier.scoreBigramExpr(text, m)
    else NbClassifier.scoreExpr(text, m)

  /** The summed sufficient statistics (one row per (label, bucket)). */
  def summedStats(spark: SparkSession): DataFrame =
    table(spark).groupBy(col("label"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  /** Derive the model from the PERSISTED counts — identical output to
    * one-shot training on the ingested corpus. */
  def model(spark: SparkSession): NbClassifier.Model =
    NbClassifier.modelOf(
      summedStats(spark).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))), dim)

  /** Compaction folds the partials — the rewritten segment is the
    * aggregated statistics, one row per (label, bucket). */
  override def compact(spark: SparkSession): Unit =
    if (liveSegments.size > 1)
      replaceAllWith(spark,
        t => t.groupBy(col("label"), col("bucket"))
          .agg(sum(col("c")).as("c")))
}
