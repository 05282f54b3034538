package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.packs.TextOps

/** Golden trace for the streaming curation pipeline: the stateless
  * gates (quality floor, stratified mixture) agree with the batch
  * pipeline's expressions doc-for-doc, exact dups are dropped within
  * the watermark horizon and re-admitted beyond it. */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  // long enough to clear the 200-token length-saturation floor partly,
  // alphabetic, with stopwords — scores well above 0.5
  private val goodText = Seq.fill(20)("the quick brown fox is of a kind and").mkString(" ")
  private val junkText = "512 9 88 1 0 3 77 4 12 9" // digits: alpha ratio 0

  test("streaming curation: quality gate, mixture gate, horizon-bounded exact dedup") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, String)]
    val out = StreamingPipelines.curateStream(
      in.toDF.toDF("doc_id", "ts", "lang", "text"),
      "doc_id", "ts", "text", "lang", watermark = "60 seconds",
      qualityMin = graft.packs.PipelineOps.QualityMin,
      ratesBp = TextOps.SampleRatesBp, defaultBp = TextOps.SampleDefaultBp)
    val q = out.select("doc_id").writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()

    def ts(s: Long) = new Timestamp(s * 1000)
    def ids(): Set[Long] =
      spark.table("curate_out").as[Long].collect().toSet

    try {
      // choose ids that pass the deterministic md5 sample gate for 'en'
      // (5000 bp): the batch gate is a pure function of (lang, id), so
      // compute expected admission with the same expression
      val cand = (1L to 40L).map(i => (i, "en"))
      val gateDf = cand.toDF("doc_id", "lang")
      val admitted = graft.operators.TextAnalysis.stratifiedSample(
          gateDf, "lang", "doc_id", TextOps.SampleRatesBp, TextOps.SampleDefaultBp)
        .as[(Long, String)].collect().map(_._1).toSet
      assert(admitted.nonEmpty && admitted.size < 40,
        s"fixture needs both admitted and thinned ids, got $admitted")
      val inId = admitted.head
      val outId = (1L to 40L).find(!admitted.contains(_)).get

      in.addData(
        (inId, ts(100), "en", goodText),   // passes all gates
        (outId, ts(101), "en", goodText),  // thinned by the mixture gate
        (900L, ts(102), "en", junkText))   // quality floor rejects
      q.processAllAvailable()
      assert(ids() == Set(inId), s"got ${ids()}")

      // exact dup of inId's text inside the horizon → dropped, even
      // though its doc_id differs (dedup keys on the text hash)
      val dupId = admitted.find(_ != inId).get
      in.addData((dupId, ts(110), "en", goodText))
      q.processAllAvailable()
      assert(ids() == Set(inId), s"in-horizon dup must drop: ${ids()}")

      // advance the watermark far past the first batch, then the same
      // text re-arrives → state was evicted, doc re-admitted
      in.addData((901L, ts(5000), "en", goodText + " sentinel marker one"))
      q.processAllAvailable()
      in.addData((902L, ts(9000), "en", goodText + " sentinel marker two"))
      q.processAllAvailable()
      val lateId = admitted.find(i => i != inId && i != dupId).get
      in.addData((lateId, ts(9100), "en", goodText))
      q.processAllAvailable()
      assert(ids().contains(lateId),
        s"beyond the horizon the hash state must be evicted: ${ids()}")
    } finally q.stop()
  }

  test("composed near-dup gate: in-horizon near-dup drops in stream AND batch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextAnalysis}
    import graft.packs.PipelineOps

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000)
    // high-overlap near-dup texts: big shared shingle set, one word of
    // difference at the end (J ≈ 0.94 — well over the 0.8 threshold)
    val tail = "gentle rivers flow across the quiet valley under pale" +
      " morning light while distant hills keep their long blue shadows"
    val base = goodText + " " + tail
    def textOf(suffix: String) = base + " " + suffix

    // three ids that pass the deterministic 'en' mixture gate
    val gateDf = (1L to 80L).map(i => (i, "en")).toDF("doc_id", "lang")
    val admitted = TextAnalysis.stratifiedSample(gateDf, "lang", "doc_id",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp)
      .as[(Long, String)].collect().map(_._1).sorted
    assert(admitted.length >= 3, s"need 3 admitted ids, got ${admitted.toList}")
    val Seq(a, b, c) = admitted.take(3).toSeq
    val thinned = (1L to 80L).find(i => !admitted.contains(i)).get

    val docs = Seq(
      (a, ts(100), "en", textOf("alpha")),        // cluster canonical / first arrival
      (b, ts(110), "en", textOf("beta")),         // in-horizon near-dup of a → drop
      (c, ts(120), "en", "completely different words about catalyst rules" +
        " and the quiet art of shuffle free physical plans " + tail),
      (thinned, ts(121), "en", textOf("gamma")),  // mixture gate rejects
      (900L, ts(122), "en", junkText))            // quality floor rejects

    // streaming: one topology, foreachBatch collapse
    val in = MemoryStream[(Long, Timestamp, String, String)]
    val verdicts = StreamingPipelines.curateNearDupStream(
      in.toDF.toDF("doc_id", "ts", "lang", "text"),
      "doc_id", "ts", "text", "lang", watermark = "60 seconds",
      qualityMin = PipelineOps.QualityMin,
      ratesBp = TextOps.SampleRatesBp, defaultBp = TextOps.SampleDefaultBp)
    val curated = scala.collection.mutable.Set[Long]()
    val q = verdicts.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        StreamingPipelines.collapseCurated(batch)
          .select("doc_id").as[Long].collect()
          .foreach(id => curated.synchronized { curated += id })
      }.start()
    try {
      in.addData(docs.map(d => (d._1, d._2, d._3, d._4)))
      q.processAllAvailable()
      assert(curated.toSet == Set(a, c),
        s"stream must keep first arrival + unrelated doc, got $curated")
    } finally q.stop()

    // batch: the same docs through the pipeline_curate composition must
    // drop the same near-dup (canonical = min id = first arrival here)
    val batchDocs = docs.toDF("doc_id", "ts", "lang", "text")
    val quality = TextAnalysis.qualityScore(batchDocs, "doc_id", "text")
    val filtered = batchDocs.join(quality, "doc_id")
      .filter(col("quality") >= PipelineOps.QualityMin)
    val sampled = TextAnalysis.stratifiedSample(filtered, "lang", "doc_id",
      TextOps.SampleRatesBp, TextOps.SampleDefaultBp)
    val clusters = Dedup.nearDupClustersFromPairs(sampled, "doc_id",
      Dedup.minhashLshMd5(sampled, "doc_id", "text"))
    val kept = sampled.join(clusters.filter(col("keep")), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(a, c),
      s"batch composition must drop the same near-dup, got $kept")
  }
}
