package graft.streaming

import graft.SparkSpec
import graft.operators.GramStore

/** The span-strip ingest loop: each batch is stripped of spans
  * duplicated against the accumulated gram corpus (or within itself),
  * the batch's ORIGINAL grams merge for future batches to match, and
  * an at-least-once replay re-emits the identical rewrite without
  * growing the store. */
class SpanIngestSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    (1 to 10).map(i => s"legal$i").mkString(" ") // 10 tokens >= k=8
  private def pad(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")

  test("sequential ingest: cross-batch boilerplate strips; original grams persist; replay exact") {
    val store = new GramStore("graft_gram_store_ingest", buckets = 2)

    def ingest(batchId: Long, docs: (Long, String)*): Map[Long, (String, Long)] =
      StreamingPipelines.spanIngestBatch(store, docs.toDF("doc_id", "text"),
          "doc_id", "text", batchId = batchId)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

    // batch 0: no duplication anywhere — both docs pass through intact
    val d10 = s"${pad("a", 20)} $boiler"
    val d11 = pad("b", 30)
    val b0 = ingest(0L, (10L, d10), (11L, d11))
    assert(b0 == Map(10L -> (d10, 0L), 11L -> (d11, 0L)), s"got $b0")

    // batch 1: 20 repeats the boilerplate doc 10 carried → stripped
    // via the STORE (nothing batch-internal); 21 untouched
    val d21 = pad("c", 25)
    val b1 = ingest(1L, (20L, s"$boiler ${pad("d", 20)}"), (21L, d21))
    assert(b1(20L) == (pad("d", 20), 10L), s"got ${b1(20L)}")
    assert(b1(21L) == (d21, 0L))

    // batch 2: doc 30 repeats it AGAIN — doc 20's rewrite lost the
    // block, but the store ingested ORIGINAL grams, so it still
    // matches (the cleaned-gram design would forget it here)
    val b2 = ingest(2L, (30L, s"${pad("e", 20)} $boiler"))
    assert(b2(30L) == (pad("e", 20), 10L), s"got ${b2(30L)}")

    // at-least-once replay of batch 2: identical rewrite, no growth
    val rowsBefore = store.table(spark).count()
    val segsBefore = store.liveSegments
    val replay = ingest(2L, (30L, s"${pad("e", 20)} $boiler"))
    assert(replay == b2, s"replay drifted: $replay vs $b2")
    assert(store.table(spark).count() == rowsBefore &&
      store.liveSegments == segsBefore, "replay must not grow the store")
  }
}
