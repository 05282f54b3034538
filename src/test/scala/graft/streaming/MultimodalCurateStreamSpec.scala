package graft.streaming

import graft.SparkSpec
import graft.operators.Multimodal
import graft.packs.PipelineOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming multimodal curation ingest == batch composition: two
  * id-aligned batches through the MediaHashStore-backed foreachBatch
  * body must reproduce pipeline_curate_multimodal row-for-row, and a
  * replayed batch must be output-identical with the store unchanged. */
class MultimodalCurateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def hashesOf(docs: DataFrame) =
    Multimodal.imageAHashes(spark,
      Multimodal.syntheticPngAssets(spark, docs)).toDF()

  private def rowSet(df: DataFrame) =
    df.select("doc_id", "lang", "quality", "img_keep", "caption_pass", "keep")
      .as[(Long, String, Double, Boolean, Boolean, Boolean)].collect().toSet

  test("two id-aligned batches == the batch pipeline, and replay is exact") {
    val docs = graft.Tables.documents(spark, sf)
    val cut = 250L // sf0.001 doc ids run 0..499ish; split mid-range
    val b0 = docs.filter(col("doc_id") < cut)
    val b1 = docs.filter(col("doc_id") >= cut)
    assert(b0.count() > 0 && b1.count() > 0, "both batches must be non-empty")

    val store = new graft.operators.MediaHashStore(
      s"mm_curate_stream_spec_${System.nanoTime()}")
    val out0 = rowSet(StreamingPipelines.multimodalCurateIngestBatch(
      store, b0, hashesOf(b0), "doc_id", "text", PipelineOps.QualityMin, 0L))
    val out1 = rowSet(StreamingPipelines.multimodalCurateIngestBatch(
      store, b1, hashesOf(b1), "doc_id", "text", PipelineOps.QualityMin, 1L))

    val want = rowSet(PipelineOps.pipelineCurateMultimodal(spark, sf))
    val got = out0 ++ out1
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    assert(want.exists(!_._4), "testdata should contain an image near-dup")
    assert(want.exists(!_._5), "testdata should contain a failing caption")

    // at-least-once: replaying batch 1 reproduces its output exactly
    val replay = rowSet(StreamingPipelines.multimodalCurateIngestBatch(
      store, b1, hashesOf(b1), "doc_id", "text", PipelineOps.QualityMin, 1L))
    assert(replay == out1)
  }
}
