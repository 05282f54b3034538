package graft.streaming

import graft.SparkSpec
import graft.operators.{BandStore, BloomStore, GramStore}
import graft.packs.TextOps

/** The complete curate+strip ingest loop (streaming twin of the batch
  * pipeline_curate_strip): duplicates retire BEFORE their grams can
  * poison the span corpus, boilerplate strips against accepted
  * survivors across batches, and replays are exact on every store. */
class CurateStripIngestSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    (1 to 10).map(i => s"notice$i the").mkString(" ") // 20 tokens >= k=8
  private def pad(p: String, n: Int) =
    (0 until n).map(i => s"$p$i the").mkString(" ") // stopworded: clears quality

  test("dups retire before gram ingest; survivor boilerplate strips across batches; replay exact") {
    val floorStore = new QualityFloorStore(1.0) // focus on dedup+strip
    val exactStore = new BloomStore(1000L)
    val bandStore = new BandStore("graft_band_store_cs", buckets = 2)
    val gramStore = new GramStore("graft_gram_store_cs", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()

    def ingest(batchId: Long, docs: (Long, String)*): Map[Long, (String, Long)] = {
      val out = StreamingPipelines.curateStripIngestBatch(floorStore,
          exactStore, bandStore, gramStore,
          accepted.toSeq.toDF("doc_id", "lang", "text"),
          docs.map { case (i, t) => (i, "zh", t) }.toDF("doc_id", "lang", "text"),
          "doc_id", "text", "lang",
          TextOps.SampleRatesBp, TextOps.SampleDefaultBp,
          threshold = 0.5, batchId = batchId)
        .select("doc_id", "clean_text", "n_dropped")
        .as[(Long, String, Long)].collect()
      // the dedup corpus keeps ORIGINAL accepted texts (the loop's
      // documented seenDocs contract), not the rewrites
      val byId = docs.toMap
      accepted ++= out.map(r => (r._1, "zh", byId(r._1)))
      out.map(r => r._1 -> (r._2, r._3)).toMap
    }

    // batch 0: 10/11 share the boilerplate (not near-dups — bodies
    // differ) → both accepted, both stripped batch-internally;
    // 12 is an EXACT copy of 10 → exact gate drops it pre-grams
    val d10 = s"$boiler ${pad("a", 30)}"
    val d11 = s"${pad("b", 30)} $boiler"
    val b0 = ingest(0L, (10L, d10), (11L, d11), (12L, d10))
    assert(b0.keySet == Set(10L, 11L), s"got ${b0.keySet}")
    assert(b0(10L) == (pad("a", 30), 20L), s"got ${b0(10L)}")
    assert(b0(11L) == (pad("b", 30), 20L), s"got ${b0(11L)}")

    // batch 1: 20 repeats the boilerplate → stripped via the STORE
    // (boiler leads the doc: a mid-doc placement would share its
    // PRECEDING-token boundary window with d11 and legitimately extend
    // the span one token left); 21 is a near-dup of accepted 11 →
    // band store drops it, so its grams must never land
    val d21 = s"${pad("b", 30)} $boiler extra trailing words here"
    val b1 = ingest(1L, (20L, s"$boiler ${pad("c", 25)}"), (21L, d21))
    assert(b1.keySet == Set(20L), s"got ${b1.keySet}")
    assert(b1(20L) == (pad("c", 25), 20L), s"got ${b1(20L)}")
    val gramIds = gramStore.table(spark)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(gramIds == Set(10L, 11L, 20L),
      s"dropped docs' grams must never enter the store: $gramIds")

    // at-least-once replay of batch 1: identical rewrite, no growth
    val rows = (gramStore.table(spark).count(), bandStore.table(spark).count())
    accepted.dropRightInPlace(1) // undo the replayed append below
    val replay = ingest(1L, (20L, s"$boiler ${pad("c", 25)}"), (21L, d21))
    assert(replay == b1, s"replay drifted: $replay vs $b1")
    assert((gramStore.table(spark).count(), bandStore.table(spark).count()) == rows,
      "replay must not grow any store")
  }
}
