package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted DSIR bucket-count model: segment sums must equal the
  * from-scratch model (count additivity is the store's whole premise),
  * replays must be no-ops (a double-counted batch silently biases
  * every weight), and compaction must FOLD the partials without moving
  * a single selection. */
class DsirStoreSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat", "en"), (2L, "the cat sat here", "en"),
    (3L, "a cat sat down", "en"), (4L, "the cat sat", "fr"),
    (5L, "zzz qqq vvv www", "fr"), (6L, "a dog ran off", "en"),
    (7L, "the dog sat", "fr"), (8L, "qqq zzz www", "fr"))
    .toDF("doc_id", "text", "lang")

  private def oneShot =
    TextAnalysis.dsirSelect(docs, "doc_id", "text", col("lang") === "en",
      buckets = 64, topN = 8).as[(Long, Double)].collect().toSeq

  test("segmented ingest ≡ one-shot model; replay no-op; compact folds") {
    val store = new DsirStore("graft_dsir_store_spec", buckets = 64,
      layoutBuckets = 4)
    store.ingest(docs.filter($"doc_id" <= 4), "doc_id", "text",
      col("lang") === "en", batchId = 0L)
    store.ingest(docs.filter($"doc_id" > 4), "doc_id", "text",
      col("lang") === "en", batchId = 1L)

    def selection = store.select(docs, "doc_id", "text", topN = 8)
      .as[(Long, Double)].collect().toSeq

    assert(store.liveSegments.size == 2)
    assert(selection == oneShot,
      "two-segment model must rank exactly like the from-scratch form")

    // at-least-once replay of batch 1: the model must not double-count
    store.ingest(docs.filter($"doc_id" > 4), "doc_id", "text",
      col("lang") === "en", batchId = 1L)
    assert(store.liveSegments.size == 2, "replayed batch must not append")
    assert(selection == oneShot)

    // compaction folds partials to ≤ buckets rows and moves nothing
    val beforeModel = store.model(spark).as[(Long, Long, Long)]
      .collect().toSet
    store.compact(spark)
    assert(store.liveSegments.size == 1)
    val folded = store.table(spark)
    assert(folded.groupBy($"bucket").count().filter($"count" > 1).count() == 0,
      "compaction must fold to one row per bucket")
    assert(store.model(spark).as[(Long, Long, Long)].collect().toSet ==
      beforeModel, "compaction must not change the model")
    assert(selection == oneShot)
  }
}
