package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted benchmark shingle set — the held-out-eval artifact the
  * decontamination gate probes at ingest time.
  *
  * The inline [[TextAnalysis.contamination]] re-shingles the benchmark
  * corpus on every run; a pipeline decontaminating every arriving batch
  * against a (slowly growing) eval suite should pay that once per
  * BENCHMARK change, not once per corpus batch. This store materializes
  * the benchmark's distinct word shingles, bucketed by shingle so the
  * probe's membership semi-join reads the bench side pre-partitioned
  * with zero shingle/explode work. Maintenance is the shared
  * append-only segment machinery ([[SegmentedBucketedStore]]): each new
  * eval set merges as its own segment (batchId-idempotent), and
  * cross-segment duplicate shingles are harmless because membership is
  * a LEFT SEMI — no compaction is ever needed for correctness.
  *
  * Unlike the corpus-side stores there is no replay-exclusion seam:
  * the benchmark set is an ABSOLUTE gate (a pure function of the doc
  * and the eval suite, not of the corpus), so probes are plain reads.
  * Verdicts are as-of-probe: docs ingested before an eval set merged
  * are not retroactively re-judged — re-judging a sink is exactly
  * [[TextAnalysis.contaminationFrom]] over it, at read time.
  *
  * `shingleN` is part of the store's identity (same contract as
  * [[GramStore]]'s k): a table built at one n probed at another would
  * silently match nothing — [[ingest]] and [[overlaps]] both shingle
  * at the stored n.
  */
final class BenchmarkStore(name: String, val shingleN: Int = 3,
    buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "s", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF("s")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    require(batch.schema("s").dataType ==
      org.apache.spark.sql.types.StringType,
      s"BenchmarkStore stores shingle STRINGS, got " +
        s"${batch.schema("s").dataType.catalogString}")
    batch.select(col("s"))
  }

  /** Publish an eval set's distinct shingles at the store's n, under
    * `batchId` so an at-least-once replay is a no-op. */
  def ingest(bench: DataFrame, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = {
    val shingles = graft.functions.WordShingles(col(textCol), shingleN)
    merge(bench.select(explode(array_distinct(shingles)).as("s")).distinct(),
      batchId)
  }

  /** Per-doc benchmark overlap of a batch against the stored suite —
    * the store-backed form of [[TextAnalysis.contamination]], identical
    * output, zero shingle work over the bench side:
    * (doc_id, overlap_shingles, flagged). */
  def overlaps(batch: DataFrame, idCol: String, textCol: String,
      minOverlap: Int = 1): DataFrame =
    TextAnalysis.contaminationFrom(batch, table(batch.sparkSession),
      idCol, textCol, shingleN, minOverlap)
}
