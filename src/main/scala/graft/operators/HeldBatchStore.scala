package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quarantine table for drift-gated ingest — the held-batch side of
  * [[graft.streaming.StreamingPipelines.curateIngestDriftGated]]:
  * batches whose distribution drift trips the alarm are routed here
  * VERBATIM (batch_id, doc_id, lang, text) instead of entering the
  * curated corpus, so an operator can review, retune the threshold,
  * and replay — nothing is dropped, nothing contaminates the stores.
  *
  * Maintenance is the shared [[SegmentedBucketedStore]] machinery
  * (append-only segments, batchId replay guard, compaction, restart
  * adoption), bucketed by batch_id so a review query for one incident
  * prunes to its own bucket. */
final class HeldBatchStore(name: String, buckets: Int = 4,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "batch_id", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, String, String)]
      .toDF("batch_id", "doc_id", "lang", "text")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    val schema = batch.schema
    require(Seq("batch_id", "doc_id", "lang", "text")
      .forall(schema.fieldNames.contains),
      s"HeldBatchStore $name: batch must carry (batch_id, doc_id, lang, " +
        s"text), got ${schema.fieldNames.mkString(", ")}")
    require(schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"HeldBatchStore stores LONG doc ids, got " +
        s"${schema("doc_id").dataType.catalogString}")
    batch.select(col("batch_id").cast("long"), col("doc_id"),
      col("lang").cast("string"), col("text").cast("string"))
  }

  /** One quarantined batch's rows, by the batchId that tripped the
    * alarm — the review query (bucket-pruned). */
  def held(spark: SparkSession, batchId: Long): DataFrame =
    table(spark).filter(col("batch_id") === batchId)
}
