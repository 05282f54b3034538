package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.{LexStore, TextAnalysis}

/** The BM25 posting-store ingest loop ([[StreamingPipelines
  * .lexIngestBatch]]): sequential batches tokenize once and merge
  * posting segments; the probe over the accumulated store must equal
  * the inline bm25Search over the concatenated corpus (cross-batch
  * df/N/avgdl exact, never per-segment), and an at-least-once replay
  * must not double postings. */
class LexIngestSpec extends SparkSpec {
  import spark.implicits._

  private val queries = Seq(
    (1L, "spark"), (1L, "shuffle"),
    (2L, "catalyst"), (2L, "planner"))

  private val b0 = Seq(
    (10L, "spark shuffle partitions and spark memory"),
    (11L, "catalyst rewrites the logical plan"),
    (12L, "nothing relevant here at all"))
  private val b1 = Seq(
    (20L, "the catalyst planner picks a shuffle strategy"),
    (21L, "spark spark spark shuffle"))

  test("sequential ingest: store probe == inline bm25 over the concatenated corpus") {
    val store = new LexStore("graft_lex_ingest_seq", buckets = 2)
    StreamingPipelines.lexIngestBatch(store, b0.toDF("doc_id", "text"),
      "doc_id", "text", batchId = 0L)
    // after batch 0: store == inline over batch 0 alone
    val q = queries.toDF("query_id", "term")
    def key(df: DataFrame): Set[(Long, Long, Double, Long)] =
      df.as[(Long, Long, Double, Long)].collect().toSet
    assert(key(store.bm25(q)) ==
      key(TextAnalysis.bm25Search(b0.toDF("doc_id", "text"), "doc_id", "text", q)),
      "store after batch 0 must equal inline over batch 0")

    StreamingPipelines.lexIngestBatch(store, b1.toDF("doc_id", "text"),
      "doc_id", "text", batchId = 1L)
    // after batch 1: df/N/avgdl span BOTH batches — scores must equal
    // the inline run over the full concatenated corpus, proving the
    // probe reads the segment union, never per-segment statistics
    val both = (b0 ++ b1).toDF("doc_id", "text")
    assert(key(store.bm25(q)) ==
      key(TextAnalysis.bm25Search(both, "doc_id", "text", q)),
      "store after batch 1 must equal inline over batches 0+1")

    // at-least-once replay: zero posting growth, zero new segments
    val before = store.table(spark).count()
    StreamingPipelines.lexIngestBatch(store, b1.toDF("doc_id", "text"),
      "doc_id", "text", batchId = 1L)
    assert(store.table(spark).count() == before,
      "replayed batchId must not merge postings twice")
    assert(key(store.bm25(q)) ==
      key(TextAnalysis.bm25Search(both, "doc_id", "text", q)),
      "replay must not change scores")
  }

  test("ingest loop compacts on its segment budget; scores survive the folds") {
    val store = new LexStore("graft_lex_ingest_cadence", buckets = 2)
    StreamingPipelines.lexIngestBatch(store, b0.toDF("doc_id", "text"),
      "doc_id", "text", batchId = 0L, maxSegments = 1)
    StreamingPipelines.lexIngestBatch(store, b1.toDF("doc_id", "text"),
      "doc_id", "text", batchId = 1L, maxSegments = 1)
    assert(store.liveSegments.size == 1,
      s"segment budget not enforced by the loop: ${store.liveSegments}")
    val q = queries.toDF("query_id", "term")
    val both = (b0 ++ b1).toDF("doc_id", "text")
    assert(store.bm25(q).as[(Long, Long, Double, Long)].collect().toSet ==
      TextAnalysis.bm25Search(both, "doc_id", "text", q)
        .as[(Long, Long, Double, Long)].collect().toSet,
      "compaction must not change scores")
  }

  test("NULL-text docs stay in N/avgdl (store == inline on a gappy corpus)") {
    // the ADVICE r14 seam: explode would drop a zero-posting doc from
    // the store entirely, shrinking N/avgdl vs the inline form; the
    // outer-explode sentinel posting keeps the doc length visible
    val gappy = Seq((30L, Some("spark shuffle again")),
      (31L, None: Option[String]),
      (32L, Some("catalyst planner notes"))).toDF("doc_id", "text")
    val store = new LexStore("graft_lex_ingest_gappy", buckets = 2)
    StreamingPipelines.lexIngestBatch(store, gappy, "doc_id", "text",
      batchId = 0L)
    val q = queries.toDF("query_id", "term")
    assert(store.bm25(q).as[(Long, Long, Double, Long)].collect().toSet ==
      TextAnalysis.bm25Search(gappy, "doc_id", "text", q)
        .as[(Long, Long, Double, Long)].collect().toSet,
      "NULL-text doc must weigh identically in both forms")
  }

  test("ingest loop drives from a real stream via foreachBatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new LexStore("graft_lex_ingest_stream", buckets = 2)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingPipelines.lexIngestBatch(store, batch, "doc_id", "text",
          batchId = batchId)
        ()
      }.start()
    try {
      in.addData(b0: _*)
      q.processAllAvailable()
      in.addData(b1: _*)
      q.processAllAvailable()
      val both = (b0 ++ b1).toDF("doc_id", "text")
      val qt = queries.toDF("query_id", "term")
      assert(store.bm25(qt).as[(Long, Long, Double, Long)].collect().toSet ==
        TextAnalysis.bm25Search(both, "doc_id", "text", qt)
          .as[(Long, Long, Double, Long)].collect().toSet,
        "streamed store must equal inline over everything ingested")
    } finally q.stop()
  }
}
