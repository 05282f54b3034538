package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BPE training state — the serving artifact behind
  * [[BpeTokenizer]]: what accumulates across ingest batches is the
  * WORD-COUNT table (counts are additive over batches — the
  * [[DsirStore]] mergeable-aggregate property; the merge table itself
  * is NOT additive, it is a global sequential derivation), so each
  * accepted batch appends its own partial (word, c) counts and the
  * merge table is DERIVED from the summed counts on demand. Because
  * the heavy-hitter draw and the training loop are deterministic pure
  * functions of the summed counts, a store fed the corpus in any batch
  * split yields the IDENTICAL merge table to one-shot training — the
  * `token_count_bpe_store` gate shares `token_count_bpe`'s oracle
  * verbatim on exactly that argument.
  *
  * Scale shape: ingest reduces each batch to its distinct-word partial
  * counts (vocabulary-bounded, partially aggregated map-side) before
  * touching the store; the derivation reads the summed table through
  * the bounded TakeOrderedAndProject draw ([[BpeTokenizer.wordCounts]]'
  * contract) and trains driver-local. [[compact]] folds partials so
  * the table stays one (word, c) row per distinct word. Replay /
  * restart semantics are [[SegmentedBucketedStore]]'s (batchId-
  * idempotent merges, pointer-driven restart adoption).
  */
final class BpeStore(name: String,
    val maxWords: Int, val numMerges: Int,
    layoutBuckets: Int = 16,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "word", layoutBuckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("word", "c")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    val sch = batch.schema
    require(Seq("word", "c").forall(sch.fieldNames.contains),
      s"BpeStore stores (word, c), got ${sch.catalogString}")
    batch.select(col("word"), col("c"))
  }

  /** Publish an accepted batch's partial word counts under `batchId`
    * (at-least-once replays no-op — double-counted words would bias
    * the heavy-hitter draw and change the trained merges). */
  def ingest(docs: DataFrame, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit =
    merge(docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c")), batchId)

  /** The summed word-count model (one row per distinct word). */
  def model(spark: SparkSession): DataFrame =
    table(spark).groupBy(col("word")).agg(sum(col("c")).as("c"))

  /** Derive the merge table from the PERSISTED counts: the bounded
    * deterministic heavy-hitter draw + the driver-local training loop
    * — identical output to one-shot training on the ingested corpus. */
  def merges(spark: SparkSession): Seq[(String, String)] =
    BpeTokenizer.train(
      model(spark).orderBy(col("c").desc, col("word").asc).limit(maxWords)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      numMerges)

  /** Compaction folds the partials — the rewritten segment is the
    * aggregated model, one row per distinct word. */
  override def compact(spark: SparkSession): Unit =
    if (liveSegments.size > 1)
      replaceAllWith(spark,
        t => t.groupBy(col("word")).agg(sum(col("c")).as("c")))
}
