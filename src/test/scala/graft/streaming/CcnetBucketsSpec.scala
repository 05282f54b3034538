package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.packs.{PipelineOps, TextOps}

/** The CCNet bucket streaming twin
  * ([[StreamingPipelines.ccnetBucketsIngestBatch]] +
  * [[GroupedBucketStore]]): read-time labels equal the batch
  * [[PipelineOps.ccnetBucketsBody]] on a finalized horizon, replay is
  * a no-op, and later mass re-buckets earlier docs retroactively. */
class CcnetBucketsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "text")

  private lazy val uniTable =
    graft.operators.UnigramLmTokenizer.trainCached(
      Tables.documents(spark, sf), sf, "text",
      TextOps.MaxBpeWords, TextOps.UnigramVocabTarget).table

  test("stream == batch on a finalized horizon; replay-exact") {
    val parS = new graft.operators.ParagraphStore(
      s"ccnetb_par_${System.nanoTime()}")
    val bucketS = StreamingPipelines.ccnetBucketStore("lang", uniTable)
    val scored = StreamingPipelines.ccnetBucketsIngestBatch(parS, bucketS,
      docs, "doc_id", "text", "lang", batchId = 0L)
    val streamed = bucketS.bucketed(scored)
      .select(col("doc_id"), col("lang"),
        (-col("quality_bp")).cast("long").as("mean_cost_millinats"),
        col("bucket"))
      .as[(Long, String, Long, String)].collect().sorted.toSeq
    val batch = PipelineOps.ccnetBucketsBody(docs, uniTable)
      .as[(Long, String, Long, String)].collect().sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream vs batch drift: ${streamed.take(3)} vs ${batch.take(3)}")
    // all three labels present on the gate corpus (thirds are thirds)
    assert(streamed.map(_._4).toSet == Set("head", "middle", "tail"))

    // at-least-once replay: same scored rows, histogram mass unchanged
    val mass = bucketS.histogram(spark).agg(sum("c")).as[Long].head()
    val replay = StreamingPipelines.ccnetBucketsIngestBatch(parS, bucketS,
        docs, "doc_id", "text", "lang", batchId = 0L)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(replay == scored.as[(Long, String, Long)].collect().sorted.toSeq)
    assert(bucketS.histogram(spark).agg(sum("c")).as[Long].head() == mass,
      "replayed batch must not double-count histogram mass")
  }

  test("labels are read-time: later mass re-buckets earlier docs") {
    // batch 0: three docs in one lang with distinct scores — the worst
    // is 'tail'. batch 1: six much-worse docs arrive; the old worst is
    // now in the best third → 'head'. Fixture text is repetition-free
    // so the scrub passes it through.
    val b0 = Seq((1L, "en", "alpha beta gamma delta epsilon zeta eta"),
      (2L, "en", "theta iota kappa lambda mu"),
      (3L, "en", "nu xi omicron")).toDF("doc_id", "lang", "text")
    val b1 = (10L to 15L).map(i =>
      (i, "en", s"w$i")).toDF("doc_id", "lang", "text")
    val parS = new graft.operators.ParagraphStore(
      s"ccnetb_par2_${System.nanoTime()}")
    // text-LENGTH key: scores distinct by construction, independent of
    // the trained LM (the ladder machinery is key-agnostic)
    val bucketS = new GroupedBucketStore(
      Seq(PipelineOps.CcnetHeadFrac, PipelineOps.CcnetMidFrac),
      Seq("head", "middle", "tail"), "lang",
      t => length(t).cast("long"))
    val s0 = StreamingPipelines.ccnetBucketsIngestBatch(parS, bucketS,
      b0, "doc_id", "text", "lang", batchId = 0L)
    val after0 = bucketS.bucketed(s0)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(after0.values.toSet == Set("head", "middle", "tail"),
      s"3 distinct-score docs must split one per bucket: $after0")
    val worst = after0.collectFirst { case (id, "tail") => id }.get
    val s1 = StreamingPipelines.ccnetBucketsIngestBatch(parS, bucketS,
      b1, "doc_id", "text", "lang", batchId = 1L)
    val after1 = bucketS.bucketed(s0.unionByName(s1))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(after1(worst) != "tail",
      s"six worse docs arrived; the old tail doc must move up: $after1")
  }
}
