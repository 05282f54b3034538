package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Persisted MERGEABLE frequency sketches — the heavy-hitter tracker a
  * continuously-ingested corpus keeps for its datacard, completing the
  * sketch-store triad ([[BloomStore]] = membership, [[HllStore]] =
  * cardinality, CmsStore = frequency): each accepted batch contributes
  * ONE Count-Min sketch row (~100 KB at eps=0.001 — a counter matrix,
  * computed DISTRIBUTED by Spark's `stat.countMinSketch` aggregate and
  * only the finished matrix reaches the driver), and the read side
  * folds the stored sketches by counter addition. With a shared seed
  * the fold is BIT-identical to a single-pass sketch of the whole
  * corpus (CmsSpec pins the merge), so per-term frequency estimates
  * never require re-scanning any batch. The exact groupBy(term) over
  * an open 100 TB vocabulary is the corpus-wide shuffle you stop
  * running; this store pays one scan per batch, forever.
  *
  * Maintenance is the shared append-only segment machinery
  * ([[SegmentedBucketedStore]]); batchId makes replays no-ops. The
  * stored row is (shard, sketch) with a constant shard key — the
  * store's value is the segment/replay/compaction protocol, not the
  * bucketing (a fold over |batches| sketch rows needs no pruning). */
final class CmsStore(name: String, buckets: Int = 1,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "shard", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, Array[Byte])].toDF("shard", "sketch")
  }

  override protected def normalize(batch: DataFrame): DataFrame =
    batch.select(col("shard"), col("sketch"))

  /** Publish an ACCEPTED batch's term-frequency sketch: one distributed
    * countMinSketch aggregate over the batch's tokens, one stored row. */
  def ingest(docs: DataFrame, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // plain explode (NOT outer): a NULL-text doc has no tokens and must
    // contribute nothing to term frequencies — same tokenization as the
    // inline sketch, so store-fold == single-pass stays bit-exact
    val cms = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .stat.countMinSketch("term", graft.packs.TextOps.CmsEps,
        graft.packs.TextOps.CmsConf, graft.packs.TextOps.CmsSeed)
    merge(Seq((0, CmsStore.toBytes(cms))).toDF("shard", "sketch"), batchId)
  }

  /** The corpus-level sketch: every stored batch sketch folded by
    * counter addition. Reads |batches| sketch rows (bounded — segment
    * compaction keeps the table small), never a corpus byte. */
  def sketch(spark: SparkSession): CountMinSketch = {
    val rows = table(spark).select(col("sketch"))
      .collect().map(r => CmsStore.fromBytes(r.getAs[Array[Byte]](0)))
    require(rows.nonEmpty, s"CmsStore $name: no sketches ingested")
    rows.reduce { (a, b) => a.mergeInPlace(b); a }
  }
}

object CmsStore {
  private[operators] def toBytes(cms: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }
  private[operators] def fromBytes(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(b))
}
