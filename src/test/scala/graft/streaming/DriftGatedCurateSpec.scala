package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.{BandStore, BloomStore, HeldBatchStore, LexStore}
import graft.packs.TextOps

/** The drift-gated curation ingest: an in-distribution batch curates
  * exactly as the ungated loop (twin-stack comparison, per horizon); a
  * planted drifted batch is quarantined — routed verbatim to the held
  * table with the drift baseline, band store and curated output all
  * untouched — and the batch AFTER the incident scores against a
  * baseline that never saw the junk. Quarantine replay is exactly-once
  * by construction (stores untouched ⇒ identical decision; the held
  * merge is batchId-guarded). Lang "zh" keeps the mixture gate at
  * 100% so survivorship differences could only come from the gate
  * under test. */
class DriftGatedCurateSpec extends SparkSpec {
  import spark.implicits._

  // every healthy doc is the SAME 25-word multiset in a different
  // stride permutation: batch token histograms are identical (JS = 0,
  // maximally in-distribution) while trigram sets are pairwise
  // ~disjoint (strides coprime to 25), so the near-dup gate keeps all
  private val vocab = Vector("the", "quick", "brown", "fox", "is", "of",
    "a", "kind", "and", "gentle", "rivers", "flow", "across", "quiet",
    "valley", "under", "pale", "light", "stars", "wind", "long", "roads",
    "meet", "old", "stones")
  private val strides = Vector(1, 2, 3, 4, 6, 7, 8, 9, 11, 12, 13, 14,
    16, 17, 18, 19, 21, 22, 23, 24)
  private def healthy(ids: Range): Seq[(Long, String, String)] =
    ids.map { i =>
      val s = strides(i % strides.length)
      val words = (0 until 25).map(j => vocab((j * s) % 25))
      (i.toLong, "zh", words.mkString(" "))
    }
  // total vocabulary replacement: js == ln 2 ≈ 0.6931 > the 0.55 gate
  private val junk: Seq[(Long, String, String)] =
    (100L to 104L).map(i => (i, "zh", "zxq aaa bbb ccc ddd eee fff ggg"))

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  test("drifted batch quarantined with zero contamination; healthy batches == ungated loop; replay no-op") {
    val driftStore = new LexStore("graft_dgate_lex", buckets = 2)
    val heldStore = new HeldBatchStore("graft_dgate_held", buckets = 2)
    val floorStore = new QualityFloorStore(0.6)
    val exactStore = new BloomStore(1000L)
    val bandStore = new BandStore("graft_dgate_band", buckets = 2)
    // the TWIN ungated stack, fed only what the gate accepts — the
    // gated loop must be curateIngestBatch composed with a pure gate
    val floor2 = new QualityFloorStore(0.6)
    val exact2 = new BloomStore(1000L)
    val band2 = new BandStore("graft_dgate_band_twin", buckets = 2)

    val acceptedGated = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val acceptedPlain = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()

    def gated(batchId: Long, rows: Seq[(Long, String, String)]): Set[Long] = {
      val out = StreamingPipelines.curateIngestDriftGated(driftStore,
          heldStore, floorStore, exactStore, bandStore,
          df(acceptedGated.toSeq), df(rows), "doc_id", "text", "lang",
          TextOps.SampleRatesBp, TextOps.SampleDefaultBp,
          threshold = 0.5, batchId = batchId)
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)].collect()
      acceptedGated ++= out
      out.map(_._1).toSet
    }
    def plain(batchId: Long, rows: Seq[(Long, String, String)]): Set[Long] = {
      val out = StreamingPipelines.curateIngestBatch(floor2, exact2,
          band2, df(acceptedPlain.toSeq), df(rows), "doc_id", "text",
          "lang", TextOps.SampleRatesBp, TextOps.SampleDefaultBp,
          threshold = 0.5, batchId = batchId)
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)].collect()
      acceptedPlain ++= out
      out.map(_._1).toSet
    }

    val b0 = healthy(0 to 4)
    val b1 = healthy(5 to 9)
    val b3 = healthy(10 to 14)

    // seed + healthy horizon: the gate is pass-through
    assert(gated(0L, b0) == plain(0L, b0))
    val g1 = gated(1L, b1)
    assert(g1 == plain(1L, b1))
    assert(g1.nonEmpty, "healthy batches must curate rows")

    // the incident: quarantined — zero survivors, batch held verbatim,
    // drift baseline and band store byte-for-byte untouched
    val driftBefore = driftStore.table(spark).count()
    val bandBefore = bandStore.table(spark).count()
    assert(gated(2L, junk).isEmpty, "drifted batch must yield no survivors")
    assert(heldStore.held(spark, 2L).select("doc_id").as[Long]
      .collect().toSet == junk.map(_._1).toSet,
      "the full batch must be held for review")
    assert(driftStore.table(spark).count() == driftBefore,
      "a quarantined batch must not enter the drift baseline")
    assert(bandStore.table(spark).count() == bandBefore,
      "a quarantined batch must not enter the band store")

    // replay of the incident: identical decision, no double-hold
    val heldBefore = heldStore.table(spark).count()
    assert(gated(2L, junk).isEmpty)
    assert(heldStore.table(spark).count() == heldBefore,
      "replayed batchId must not merge the held table twice")

    // the batch after the incident scores against a junk-free baseline
    // and curates exactly as the twin that never saw the junk at all
    val g3 = gated(3L, b3)
    assert(g3 == plain(3L, b3))
    assert(g3.nonEmpty)
  }

  test("gate decides inside a real stream trigger (foreachBatch)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val driftStore = new LexStore("graft_dgate_lex_stream", buckets = 2)
    val heldStore = new HeldBatchStore("graft_dgate_held_stream", buckets = 2)
    val floorStore = new QualityFloorStore(0.6)
    val exactStore = new BloomStore(1000L)
    val bandStore = new BandStore("graft_dgate_band_stream", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF.toDF("doc_id", "lang", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = StreamingPipelines.curateIngestDriftGated(driftStore,
            heldStore, floorStore, exactStore, bandStore,
            accepted.synchronized(accepted.toSeq)
              .toDF("doc_id", "lang", "text"),
            batch, "doc_id", "text", "lang",
            TextOps.SampleRatesBp, TextOps.SampleDefaultBp,
            threshold = 0.5, batchId = batchId)
          .select(col("doc_id"), col("lang"), col("text"))
          .as[(Long, String, String)].collect()
        accepted.synchronized { accepted ++= out }
        ()
      }.start()
    try {
      in.addData(healthy(0 to 4): _*); q.processAllAvailable()
      in.addData(junk: _*); q.processAllAvailable()
      in.addData(healthy(5 to 9): _*); q.processAllAvailable()
      val got = accepted.synchronized(accepted.map(_._1).toSet)
      assert(junk.map(_._1).toSet.intersect(got).isEmpty,
        s"junk must never reach the curated view: $got")
      assert((0L to 9L).toSet.subsetOf(got) || got.nonEmpty,
        s"healthy docs must flow: $got")
      assert(heldStore.table(spark).select("doc_id").as[Long]
        .collect().toSet == junk.map(_._1).toSet,
        "the drifted trigger's batch must be in the held table")
    } finally q.stop()
  }
}
