package graft.streaming

import graft.SparkSpec
import graft.operators.{DsirStore, TextAnalysis}
import org.apache.spark.sql.functions._

/** The DSIR ingest loop: the model accumulated over N streamed batches
  * must rank exactly like the one-shot form over their union, replays
  * must not bias the counts, and compaction under the segment budget
  * must not move a selection. */
class DsirIngestSpec extends SparkSpec {
  import spark.implicits._

  private val all = Seq(
    (1L, "the cat sat", "en"), (2L, "the cat sat here", "en"),
    (3L, "a cat sat down", "en"), (4L, "the cat sat", "fr"),
    (5L, "zzz qqq vvv www", "fr"), (6L, "a dog ran off", "en"),
    (7L, "the dog sat", "fr"), (8L, "qqq zzz www", "fr"),
    (9L, "a cat ran here", "en"), (10L, "vvv zzz qqq", "fr"))

  test("streamed model ≡ one-shot; replay no-op; budgeted compaction moves nothing") {
    val store = new DsirStore("graft_dsir_store_ingest", buckets = 64,
      layoutBuckets = 4)

    def ingest(batchId: Long, docs: Seq[(Long, String, String)]): Unit = {
      val out = StreamingPipelines.dsirIngestBatch(store,
        docs.toDF("doc_id", "text", "lang"), "doc_id", "text",
        col("lang") === "en", batchId = batchId, maxSegments = 2)
      // maintenance-only body: the batch passes through untouched
      assert(out.count() == docs.size)
    }

    all.grouped(3).zipWithIndex.foreach { case (batch, i) =>
      ingest(i.toLong, batch)
    }
    // 4 batches under a 2-segment budget → compaction ran at least once
    assert(store.liveSegments.size <= 3,
      s"segment budget not enforced: ${store.liveSegments}")

    val want = TextAnalysis.dsirSelect(
      all.toDF("doc_id", "text", "lang"), "doc_id", "text",
      col("lang") === "en", buckets = 64, topN = 10)
      .as[(Long, Double)].collect().toSeq
    def got = store.select(all.toDF("doc_id", "text", "lang"),
      "doc_id", "text", topN = 10).as[(Long, Double)].collect().toSeq
    assert(got == want, "streamed model must rank like the one-shot form")

    // replay the last batch: counts must not double
    ingest(3L, all.grouped(3).toSeq.last)
    assert(got == want, "replay biased the model")
  }
}
