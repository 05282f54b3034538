package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.packs.TextOps

/** The master streaming composition
  * ([[StreamingPipelines.masterIngestBatch]]): online-classifier gate
  * in front of the CCNet chain — compositional, replay-exact, and the
  * gate really gates. */
class MasterIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "text")

  private lazy val uniTable =
    graft.operators.UnigramLmTokenizer.trainCached(
      Tables.documents(spark, sf), sf, "text",
      TextOps.MaxBpeWords, TextOps.UnigramVocabTarget).table

  private def freshStores() = (
    new graft.operators.NbStore(s"master_nb_${System.nanoTime()}"),
    new graft.operators.ParagraphStore(s"master_par_${System.nanoTime()}"),
    new QualityFloorStore(TextOps.UnigramLmKeepFrac,
      StreamingPipelines.ccnetFloorKey(uniTable)),
    new graft.operators.BloomStore(1000L),
    new graft.operators.BandStore(s"master_band_${System.nanoTime()}",
      buckets = 2))

  private val emptySeen = () =>
    Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")

  test("compositional: classifier gate then the ccnet chain, verbatim; replay-exact") {
    val (nbS, parS, floorS, exactS, bandS) = freshStores()
    val out = StreamingPipelines.masterIngestBatch(nbS, parS, floorS,
        exactS, bandS, emptySeen(), docs, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty, "the gate corpus must yield survivors")

    // the composition must equal its two stages run separately with
    // twin stores: online NB gate (update-then-gate), then the plain
    // ccnet ingest on the admitted docs
    val (nbT, parT, floorT, exactT, bandT) = freshStores()
    val b = docs.localCheckpoint()
    nbT.ingest(b, "doc_id", "text", 0L)
    val m = nbT.model(spark)
    val admitted = b.filter(nbT.rawScoreExprOf(col("text"), m) > 0)
    val twin = StreamingPipelines.ccnetIngestBatch(parT, floorT, exactT,
        bandT, emptySeen(), admitted, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == twin, "the composition must be the two stages verbatim")

    // the gate really gates: some docs are classifier-rejected, and no
    // rejected doc can appear among the survivors
    val rejected = b.filter(nbT.rawScoreExprOf(col("text"), m) <= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(rejected.nonEmpty, "gate corpus has classifier-negative docs")
    assert(out.intersect(rejected).isEmpty)

    // at-least-once replay: identical survivors, no store growth
    val parRows = parS.table(spark).count()
    val replay = StreamingPipelines.masterIngestBatch(nbS, parS, floorS,
        exactS, bandS, emptySeen(), docs, "doc_id", "text", "lang",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp, batchId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(replay == out)
    assert(parS.table(spark).count() == parRows)
  }
}
