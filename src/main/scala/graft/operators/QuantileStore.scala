package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE per-group quantile state — the quantile leg of
  * the sketch-store family ([[BloomStore]] = membership, [[HllStore]] =
  * cardinality, [[CmsStore]] = frequency, QuantileStore = rank): each
  * accepted batch contributes its partial-aggregated per-group VALUE
  * HISTOGRAM rows `(g, v, c)` as one append-only segment, and the read
  * side folds segments by counter addition — the merge is exact by
  * construction (histogram addition commutes and associates), so
  * store-fold quantiles are IDENTICAL to a single pass over the
  * concatenated corpus. This is deliberately STRONGER than persisting a
  * GK/KLL quantile sketch: the house cents-histogram discipline
  * ([[TextAnalysis.qualityBp]] and the quality-floor stores) already
  * bounds the state by the VALUE DOMAIN — |distinct integer values| per
  * group, never the row count — and at that bound the exact fold costs
  * what a mergeable sketch would while keeping the DuckDB oracle
  * value-exact (zero sketch drift to argue about).
  *
  * Read arithmetic: Spark's exact `percentile(v, p, c)` WITH the
  * frequency argument over the folded histogram. Spark's Percentile
  * aggregate internally buffers a value→count map — i.e. exactly this
  * histogram — so the store read is bit-identical to the inline
  * `percentile` over the raw rows ([[graft.packs.RelationalOps
  * .percentiles]] gates both under one oracle). Group state at read
  * time is value-domain-bounded, the same envelope as the inline form.
  *
  * Scale shape: ingest is one map-side-combining partial agg of the
  * BATCH to its (g, v, c) sliver before any bytes are written (bytes
  * per merge scale with the batch's value spread, never the corpus);
  * maintenance — segments, replay guard, compaction, restart adoption
  * — is the shared [[SegmentedBucketedStore]] machinery, bucketed by
  * group so a single-segment store's read-side groupBy is
  * Exchange-free. The corpus is never re-scanned: a 100 TB stream's
  * running p50/p95 costs one histogram pass per batch, forever.
  *
  * Group keys are carried in STRING form (the
  * [[graft.streaming.GroupedQualityFloorStore]] convention): the store
  * schema is fixed while callers group by any primitive-typed column;
  * distinct keys with equal string forms would collapse (not a thing
  * for the primitive types a group key sensibly is — documented
  * constraint there too). */
final class QuantileStore(name: String, buckets: Int = 8,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "g", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long)].toDF("g", "v", "c")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    val schema = batch.schema
    require(Seq("g", "v", "c").forall(schema.fieldNames.contains),
      s"QuantileStore $name: batch must carry (g, v, c), got " +
        schema.fieldNames.mkString(", "))
    batch.select(col("g").cast("string"), col("v").cast("long"),
      col("c").cast("long"))
  }

  /** Publish an ACCEPTED batch's per-group value histogram: one
    * map-side-combining partial agg over the batch, one stored segment.
    * `value` must be an integer-typed expression (the cents/bp
    * discipline — a raw double key would make the histogram domain the
    * float continuum and the cross-engine compare a ulp lottery). */
  def ingest(rows: DataFrame, groupCol: String, value: Column,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = {
    val hist = rows
      .select(col(groupCol).cast("string").as("g"), value.cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    merge(hist, batchId)
  }

  /** The folded corpus histogram (g, v, c): all stored segments merged
    * by counter addition — one partial-agg groupBy over segment rows
    * (value-domain-bounded), never a corpus byte. */
  def histogram(spark: SparkSession): DataFrame =
    table(spark).groupBy(col("g"), col("v"))
      .agg(sum(col("c")).cast("long").as("c"))

  /** Exact interpolated per-group quantiles from the folded histogram:
    * (g, qs array<double> ordered as `percentages`, n). Identical to
    * the inline exact `percentile` over the raw concatenated rows —
    * Spark's Percentile buffers a value→count map internally, so
    * feeding it the folded counts via the frequency argument replays
    * the exact same final computation. */
  def quantiles(spark: SparkSession, percentages: Seq[Double]): DataFrame = {
    val ps = percentages.map(p => s"${p}D").mkString(", ")
    histogram(spark).groupBy(col("g"))
      .agg(expr(s"percentile(v, array($ps), c)").as("qs"),
        sum(col("c")).cast("long").as("n"))
  }
}
