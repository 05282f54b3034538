package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min frequency sketches (TextOps.term_freq_topk family): the
  * never-undercount property, the lossless-merge property (counter
  * addition at a shared seed == single pass, bit-exact), and the gated
  * eps bound with margin. */
class CmsSpec extends SparkSpec {
  import graft.packs.TextOps.{CmsConf, CmsEps, CmsSeed}

  test("merge of batch sketches == single-pass sketch; never undercounts; bound holds") {
    val tok = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
    val single = tok.stat.countMinSketch("term", CmsEps, CmsConf, CmsSeed)
    val a = tok.filter(col("doc_id") % 2 === 0)
      .stat.countMinSketch("term", CmsEps, CmsConf, CmsSeed)
    val b = tok.filter(col("doc_id") % 2 =!= 0)
      .stat.countMinSketch("term", CmsEps, CmsConf, CmsSeed)
    a.mergeInPlace(b)
    val exact = tok.groupBy(col("term")).count()
      .as[(String, Long)](org.apache.spark.sql.Encoders.product[(String, Long)])
      .collect()
    val total = exact.map(_._2).sum
    val slack = math.ceil(CmsEps * total).toLong
    exact.foreach { case (t, n) =>
      val e1 = single.estimateCount(t)
      val e2 = a.estimateCount(t)
      assert(e1 == e2, s"merge must equal single pass for '$t': $e1 vs $e2")
      assert(e1 >= n, s"CMS undercounted '$t': $e1 < $n")
      assert(e1 <= n + slack, s"'$t' overestimate past eps bound: $e1 > $n + $slack")
    }
  }

  test("CmsStore: stored-segment fold == single-pass sketch, replay no-op, compaction safe") {
    val docs = graft.Tables.documents(spark, sf)
    val tok = docs.select(explode(TextAnalysis.tokens(col("text"))).as("term"))
    val single = tok.stat.countMinSketch("term", CmsEps, CmsConf, CmsSeed)
    val store = new CmsStore("graft_cms_spec")
    store.ingest(docs.filter(col("doc_id") % 2 === 0), "text", 1L)
    store.ingest(docs.filter(col("doc_id") % 2 =!= 0), "text", 2L)
    val probe = Seq("the", "spark", "data", "xyzzy-not-a-term")
    val folded = store.sketch(spark)
    probe.foreach { t =>
      assert(folded.estimateCount(t) == single.estimateCount(t),
        s"stored fold must be bit-identical to single pass for '$t'")
    }
    // at-least-once replay: no double-count
    store.ingest(docs.filter(col("doc_id") % 2 =!= 0), "text", 2L)
    probe.foreach { t =>
      assert(store.sketch(spark).estimateCount(t) == single.estimateCount(t),
        s"replayed batch must not double counts for '$t'")
    }
    // serialization roundtrip is exact (the segment is parquet bytes)
    val rt = CmsStore.fromBytes(CmsStore.toBytes(single))
    probe.foreach(t => assert(rt.estimateCount(t) == single.estimateCount(t)))
    // compaction folds segments without changing estimates
    store.compactIfNeeded(spark, maxSegments = 1)
    assert(store.liveSegments.size <= 1, s"budget: ${store.liveSegments}")
    probe.foreach { t =>
      assert(store.sketch(spark).estimateCount(t) == single.estimateCount(t),
        s"compaction must not change counts for '$t'")
    }
  }

  test("cmsIngestBatch drives from a real stream via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new CmsStore("graft_cms_ingest_stream")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.streaming.StreamingPipelines.cmsIngestBatch(store, batch,
          "text", batchId = batchId)
        ()
      }.start()
    val b0 = Seq((1L, "spark spark shuffle"), (2L, "catalyst plans"))
    val b1 = Seq((3L, "spark catalyst"))
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
      val single = (b0 ++ b1).toDF("doc_id", "text")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .stat.countMinSketch("term", CmsEps, CmsConf, CmsSeed)
      Seq("spark", "catalyst", "shuffle", "plans").foreach { t =>
        assert(store.sketch(spark).estimateCount(t) == single.estimateCount(t),
          s"streamed store must fold to the single-pass sketch for '$t'")
      }
    } finally q.stop()
  }
}
