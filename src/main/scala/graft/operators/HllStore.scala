package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE cardinality sketches — the per-source
  * distinct-vocabulary tracker a continuously-ingested corpus keeps
  * for its datacard: each accepted batch contributes ONE DataSketches
  * HLL sketch row per source (`hll_sketch_agg`, a few KB), and the
  * read side unions the stored sketches (`hll_union_agg`) into the
  * corpus-level estimate — no batch is ever re-scanned, and the union
  * is exactly as accurate as a single-pass sketch of the whole corpus
  * (HLL union is lossless over sketches of the same lgConfigK).
  * countDistinct over an open 100 TB vocabulary is a corpus-wide
  * exact-distinct shuffle EVERY time someone reads the number; this
  * store pays one scan per batch, forever.
  *
  * Maintenance is the shared append-only segment machinery
  * ([[SegmentedBucketedStore]]); batchId makes replays no-ops. The
  * gate discipline mirrors approx_distinct: the estimate itself is
  * engine-specific, so the registered query emits the EXACT count
  * (cross-engine verified) plus the estimate-within-bound CLAIM as a
  * boolean the oracle expects TRUE — a sketch regression breaks the
  * hash. */
final class HllStore(name: String, buckets: Int = 8,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "source", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Array[Byte])].toDF("source", "sketch")
  }

  override protected def normalize(batch: DataFrame): DataFrame =
    batch.select(col("source"), col("sketch"))

  /** Publish an ACCEPTED batch's per-source vocabulary sketches. */
  def ingest(docs: DataFrame, srcCol: String, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit =
    merge(docs
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("term")).as("sketch")), batchId)

  /** Corpus-level per-source estimates from the UNION of every stored
    * batch sketch — reads sketch rows only (|sources|·|batches|). */
  def estimates(spark: SparkSession): DataFrame =
    table(spark).groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("est_terms"))
}
