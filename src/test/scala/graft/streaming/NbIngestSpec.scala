package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{NbClassifier, NbStore, TextAnalysis}

/** The online-classifier ingest loop
  * ([[StreamingPipelines.classifierIngestBatch]]): batches merge their
  * sufficient statistics then score under the post-merge model —
  * replays are exact, the model evolves across batches toward the
  * one-shot model of the union, and a stream that has not yet seen
  * both classes fails loudly. */
class NbIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "text")

  private def freshStore() =
    new NbStore(s"nb_ingest_spec_${System.nanoTime()}")

  test("update-then-predict: replayed batch re-emits identical scores") {
    val store = freshStore()
    val b0 = docs.filter(col("doc_id") < 250)
    val out0 = StreamingPipelines
      .classifierIngestBatch(store, b0, "doc_id", "text", batchId = 0L)
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out0.nonEmpty)
    val tableRows = store.table(spark).count()

    // at-least-once redelivery: the merge no-ops, the derived model is
    // identical, the emitted rows are identical
    val replay = StreamingPipelines
      .classifierIngestBatch(store, b0, "doc_id", "text", batchId = 0L)
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(replay.toSeq == out0.toSeq, "replay drifted the scores")
    assert(store.table(spark).count() == tableRows,
      "replay must not grow the count table")
  }

  test("model evolves per batch and converges to one-shot on the union") {
    val store = freshStore()
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)
    StreamingPipelines.classifierIngestBatch(store, b0, "doc_id", "text",
      batchId = 0L).collect()
    val m0 = store.model(spark)
    StreamingPipelines.classifierIngestBatch(store, b1, "doc_id", "text",
      batchId = 1L).collect()
    val m1 = store.model(spark)
    assert(m1 != m0, "second batch must move the model")
    assert(m1 == NbClassifier.train(docs, "doc_id", "text"),
      "streamed counts must derive the one-shot model of the union")
  }

  test("keep is the exact log-odds sign, consistent with the score") {
    val store = freshStore()
    val out = StreamingPipelines
      .classifierIngestBatch(store, docs, "doc_id", "text", batchId = 0L)
    val m = store.model(spark)
    val recomputed = docs.select(col("doc_id"),
      ((lit(m.biasScaled) +
        graft.functions.NbScoreRaw(col("text"), m.scorer)) > 0).as("k"))
    val joined = out.select(col("doc_id"), col("keep"))
      .join(recomputed, "doc_id")
      .filter(col("keep") =!= col("k")).count()
    assert(joined == 0, "keep must equal the exact integer sign")
    // and the rounded score never disagrees with keep by more than the
    // rounding granule: keep=true implies score >= 0 (never negative)
    assert(out.filter(col("keep") && col("clf_score") < 0).count() == 0)
  }

  test("classifier-gated composed curate: gate-first, compositional, replay-exact") {
    import graft.packs.TextOps
    val nbStore = freshStore()
    val floorStore = new QualityFloorStore(1.0)
    val exactStore = new graft.operators.BloomStore(1000L)
    val bandStore = new graft.operators.BandStore(
      s"nb_curate_band_${System.nanoTime()}", buckets = 2)
    val emptySeen = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    // corpus docs teach both classes; planted mash teaches (and then
    // fails) the negative class — its tokens accumulate pure
    // negative-class counts, so the gate rejects it on learned
    // evidence, not just the unseen-bucket default
    val mashIds = Set(900001L, 900002L)
    val batch = docs.unionByName(Seq(
      (900001L, "en", "zzqx wvvk jjmm ppqq zzqx wvvk"),
      (900002L, "en", "qqqq zzzz xxxx qqqq zzzz xxxx"))
      .toDF("doc_id", "lang", "text"))
    val out = StreamingPipelines.curateClassifierIngestBatch(nbStore,
        floorStore, exactStore, bandStore, emptySeen, batch,
        "doc_id", "text", "lang", TextOps.SampleRatesBp,
        TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    assert(out.intersect(mashIds).isEmpty,
      "classifier must reject the mash before dedup ever sees it")

    // compositional: identical to the plain composed loop run on the
    // admitted subset with twin stores (the gate is a pure pre-filter)
    val m = nbStore.model(spark)
    val admitted = batch.filter((lit(m.biasScaled) +
      graft.functions.NbScoreRaw(col("text"), m.scorer)) > 0)
    val twin = StreamingPipelines.curateIngestBatch(
        new QualityFloorStore(1.0), new graft.operators.BloomStore(1000L),
        new graft.operators.BandStore(
          s"nb_curate_band_twin_${System.nanoTime()}", buckets = 2),
        emptySeen, admitted, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == twin)

    // at-least-once replay: same survivors, no store growth
    val tableRows = nbStore.table(spark).count()
    val replay = StreamingPipelines.curateClassifierIngestBatch(nbStore,
        floorStore, exactStore, bandStore, emptySeen, batch,
        "doc_id", "text", "lang", TextOps.SampleRatesBp,
        TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(replay == out)
    assert(nbStore.table(spark).count() == tableRows)
  }

  test("bigram-featured store: streamed counts derive one-shot trainBigram; scores use the bigram walker") {
    val store = new NbStore(s"nb_ingest_bi_${System.nanoTime()}", bigram = true)
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)
    val out0 = StreamingPipelines
      .classifierIngestBatch(store, b0, "doc_id", "text", batchId = 0L)
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out0.nonEmpty)
    StreamingPipelines.classifierIngestBatch(store, b1, "doc_id", "text",
      batchId = 1L).collect()
    assert(store.model(spark) == NbClassifier.trainBigram(docs, "doc_id", "text"),
      "bigram-featured streamed counts must derive the one-shot bigram model")
    // the emitted keep is the BIGRAM walker's sign — scoring a
    // bigram-trained model with the unigram walker must disagree
    // somewhere (same weights, wrong features), or the dispatch seam
    // is decorative
    val m = NbClassifier.trainBigram(
      docs.filter(col("doc_id") < 250), "doc_id", "text")
    val uniVsBi = b0.select(
        (NbClassifier.rawScoreExpr(col("text"), m) > 0).as("u"),
        (NbClassifier.rawScoreBigramExpr(col("text"), m) > 0).as("b"))
      .filter(col("u") =!= col("b")).count()
    assert(uniVsBi > 0,
      "fixture too bland: unigram and bigram walkers agree on every doc")
    val recomputed = docs.filter(col("doc_id") < 250).select(col("doc_id"),
      (NbClassifier.rawScoreBigramExpr(col("text"), m) > 0).as("k"))
    assert(out0.map(r => (r._1, r._3)).toSeq ==
      recomputed.as[(Long, Boolean)].collect().sortBy(_._1).toSeq,
      "emitted keep must be the bigram walker's exact sign")
  }

  test("bigram-gated composed curate: stream == batch twin on the admitted subset, replay-exact") {
    import graft.packs.TextOps
    val nbStore = new NbStore(s"nb_curate_bi_${System.nanoTime()}", bigram = true)
    val floorStore = new QualityFloorStore(1.0)
    val exactStore = new graft.operators.BloomStore(1000L)
    val bandStore = new graft.operators.BandStore(
      s"nb_curate_bi_band_${System.nanoTime()}", buckets = 2)
    val emptySeen = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    val mashIds = Set(900001L, 900002L)
    val batch = docs.unionByName(Seq(
      (900001L, "en", "zzqx wvvk jjmm ppqq zzqx wvvk"),
      (900002L, "en", "qqqq zzzz xxxx qqqq zzzz xxxx"))
      .toDF("doc_id", "lang", "text"))
    val out = StreamingPipelines.curateClassifierIngestBatch(nbStore,
        floorStore, exactStore, bandStore, emptySeen, batch,
        "doc_id", "text", "lang", TextOps.SampleRatesBp,
        TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    assert(out.intersect(mashIds).isEmpty,
      "bigram classifier must reject the mash before dedup sees it")

    // stream == batch: identical to the plain composed loop on the
    // BIGRAM-admitted subset with twin stores
    val m = nbStore.model(spark)
    val admitted = batch.filter(
      NbClassifier.rawScoreBigramExpr(col("text"), m) > 0)
    val twin = StreamingPipelines.curateIngestBatch(
        new QualityFloorStore(1.0), new graft.operators.BloomStore(1000L),
        new graft.operators.BandStore(
          s"nb_curate_bi_twin_${System.nanoTime()}", buckets = 2),
        emptySeen, admitted, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == twin)

    val tableRows = nbStore.table(spark).count()
    val replay = StreamingPipelines.curateClassifierIngestBatch(nbStore,
        floorStore, exactStore, bandStore, emptySeen, batch,
        "doc_id", "text", "lang", TextOps.SampleRatesBp,
        TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(replay == out)
    assert(nbStore.table(spark).count() == tableRows)
  }

  test("a stream that has only seen one class fails loudly") {
    val store = freshStore()
    val onlyPos = docs
      .filter(NbClassifier.labelExpr(
        TextAnalysis.qualityExpr(col("text"))) === 1)
    assert(onlyPos.count() > 0)
    val e = intercept[IllegalArgumentException] {
      StreamingPipelines.classifierIngestBatch(store, onlyPos,
        "doc_id", "text", batchId = 0L).collect()
    }
    assert(e.getMessage.contains("both classes"))
  }
}
