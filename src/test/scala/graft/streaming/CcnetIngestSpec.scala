package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.packs.TextOps

/** The CCNet streaming composition
  * ([[StreamingPipelines.ccnetIngestBatch]]): paragraph scrub in front
  * of the LM-floored curate loop — compositional, LM-keyed, and
  * replay-exact. */
class CcnetIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "text")

  private lazy val uniTable =
    graft.operators.UnigramLmTokenizer.trainCached(
      Tables.documents(spark, sf), sf, "text",
      TextOps.MaxBpeWords, TextOps.UnigramVocabTarget).table

  test("ccnetFloorKey == the batch pipeline's negated millinat expression") {
    val key = StreamingPipelines.ccnetFloorKey(uniTable)
    val viaKey = docs.select(col("doc_id"), key(col("text")).as("k"))
    val viaBatch = docs.select(col("doc_id"),
        graft.functions.UnigramLmCost(col("text"), uniTable).as("cost_micro"),
        graft.functions.UnigramTokenCount(col("text"), uniTable).as("n_tok"))
      .select(col("doc_id"),
        expr("-(cost_micro div (n_tok * 1000L))").as("k"))
    assert(viaKey.as[(Long, Long)].collect().sorted.toSeq ==
      viaBatch.as[(Long, Long)].collect().sorted.toSeq,
      "the pluggable store key must be the batch floor key verbatim")
  }

  test("ccnetIngestBatch: compositional (scrub then curate with twin stores); replay-exact") {
    def freshStores() = (
      new graft.operators.ParagraphStore(s"ccnet_par_${System.nanoTime()}"),
      new QualityFloorStore(TextOps.UnigramLmKeepFrac,
        StreamingPipelines.ccnetFloorKey(uniTable)),
      new graft.operators.BloomStore(1000L),
      new graft.operators.BandStore(s"ccnet_band_${System.nanoTime()}",
        buckets = 2))
    val emptySeen = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")

    val (parS, floorS, exactS, bandS) = freshStores()
    val out = StreamingPipelines.ccnetIngestBatch(parS, floorS, exactS,
        bandS, emptySeen, docs, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty)

    // compositional: identical to scrubbing first, then the plain
    // curate loop on the scrubbed survivors with twin stores
    val (parT, floorT, exactT, bandT) = freshStores()
    val scrubbed = StreamingPipelines
      .paragraphIngestBatch(parT, docs, "doc_id", "text", batchId = 0L)
      .filter(length(col("clean_text")) > 0)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("clean_text").as("text"))
    val twin = StreamingPipelines.curateIngestBatch(floorT, exactT, bandT,
        emptySeen, scrubbed, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == twin, "the composition must be the two stages verbatim")

    // the floor histogram lives in the LM-millinat domain, not the
    // heuristic's basis points: keys are NEGATED mean costs (all
    // negative, ~-3400 for ~3.4 nats/token), where quality_bp would be
    // 0..10000 positive
    val hist = floorS.histogram(spark).as[(Long, Long)].collect()
    assert(hist.nonEmpty && hist.map(_._1).max < 0L,
      s"LM-keyed histogram expected negated millinat keys, got ${hist.take(3).toSeq}")

    // at-least-once replay: identical survivors, no store growth
    val parRows = parS.table(spark).count()
    val replay = StreamingPipelines.ccnetIngestBatch(parS, floorS, exactS,
        bandS, emptySeen, docs, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(replay == out)
    assert(parS.table(spark).count() == parRows)
  }
}
