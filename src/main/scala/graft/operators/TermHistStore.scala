package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted GROUPED token-histogram segments — the per-group
  * monitoring baseline of the drift family: each accepted batch
  * contributes its map-side-combined `(g, word, n)` token counts as
  * one append-only segment, and the read side folds segments by
  * counter addition — exact by construction (histogram addition
  * commutes and associates), so a store-folded seen side is
  * bit-identical to re-tokenizing the concatenated corpus.
  *
  * This closes the seam [[graft.operators.TextAnalysis.jsDriftBySource]]
  * leaves open: the whole-corpus monitor probes a [[LexStore]]'s
  * postings (sum(tf) by term), but that fold LOSES the source
  * dimension — the per-source monitor had to re-tokenize the seen
  * corpus every trigger. Persisting the histogram WITH its group key
  * (the [[QuantileStore]] segment pattern, group = source) makes the
  * per-source baseline a segment fold too.
  *
  * Scale shape: ingest partial-aggregates the BATCH to its (g, word,
  * n) sliver before any bytes are written — segment bytes scale with
  * the batch's vocabulary spread, never the corpus; the read-side fold
  * is one partial-agg groupBy over vocabulary-sized rows, bucketed by
  * group so a single-segment store folds Exchange-free. Maintenance
  * (segments, replay guard, compaction, restart adoption) is the
  * shared [[SegmentedBucketedStore]] machinery.
  *
  * Group keys are carried in STRING form (the [[QuantileStore]]
  * convention): the store schema is fixed while callers group by any
  * primitive-typed column. */
final class TermHistStore(name: String, buckets: Int = 8,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "g", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long)].toDF("g", "word", "n")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    val schema = batch.schema
    require(Seq("g", "word", "n").forall(schema.fieldNames.contains),
      s"TermHistStore $name: batch must carry (g, word, n), got " +
        schema.fieldNames.mkString(", "))
    batch.select(col("g").cast("string"), col("word").cast("string"),
      col("n").cast("long"))
  }

  /** Publish an ACCEPTED batch's per-group token histogram: one
    * map-side-combining partial agg over the batch's tokens
    * (the shared [[TextAnalysis.tokens]] split — the drift family's
    * tokenization, so store folds and recompute cannot diverge), one
    * stored segment. */
  def ingest(docs: DataFrame, groupCol: String, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = {
    val hist = docs
      .select(col(groupCol).cast("string").as("g"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("g"), col("word")).agg(count(lit(1)).as("n"))
    merge(hist, batchId)
  }

  /** The folded corpus histogram (g, word, n): all stored segments
    * merged by counter addition — one partial-agg groupBy over
    * vocabulary-sized segment rows, never a corpus byte. */
  def histogram(spark: SparkSession): DataFrame =
    table(spark).groupBy(col("g"), col("word"))
      .agg(sum(col("n")).cast("long").as("n"))
}
