package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.{LexStore, TextAnalysis}

/** The drift-monitor ingest loop: per trigger, the batch's JS drift
  * against the posting store's accumulated distribution must equal the
  * inline drift against the concatenation of all prior batches (the
  * store IS the corpus histogram), the first batch emits no row, and
  * a replayed trigger never double-merges postings. */
class DriftIngestSpec extends SparkSpec {
  import spark.implicits._

  private val b0 = Seq((1L, "alpha beta gamma alpha"), (2L, "beta delta"))
  private val b1 = Seq((3L, "alpha alpha epsilon"), (4L, "zeta beta"))
  private val b2 = Seq((5L, "totally novel vocabulary here"))

  private def inlineDrift(batch: Seq[(Long, String)],
      prior: Seq[(Long, String)]): Seq[(Long, Long, Double)] =
    TextAnalysis.jsDriftVsCorpus(batch.toDF("doc_id", "text"), "text",
        TextAnalysis.wordCounts(prior.toDF("doc_id", "text"), "text"))
      .as[(Long, Long, Double)].collect().toSeq

  test("drift-at-ingest == inline drift vs all prior batches, per horizon") {
    val store = new LexStore("graft_drift_ingest", buckets = 2)

    def monitor(batchId: Long, docs: Seq[(Long, String)]): Seq[(Long, Long, Double)] =
      StreamingPipelines.driftMonitorBatch(store,
          docs.toDF("doc_id", "text"), "doc_id", "text", batchId = batchId)
        .as[(Long, Long, Double)].collect().toSeq

    // first batch: no baseline → empty monitor row, postings merged
    assert(monitor(0L, b0).isEmpty, "no drift row against an empty store")
    // horizon 1: monitor == inline vs b0
    assert(monitor(1L, b1) == inlineDrift(b1, b0))
    // horizon 2 (novel vocab): monitor == inline vs b0 ++ b1, ≈ ln 2
    val d2 = monitor(2L, b2)
    assert(d2 == inlineDrift(b2, b0 ++ b1))
    assert(math.abs(d2.head._3 - math.log(2)) <= 0.0002, s"got $d2")

    // replay of batch 2: the merge must not double-count postings
    val before = store.table(spark).count()
    StreamingPipelines.driftMonitorBatch(store,
      b2.toDF("doc_id", "text"), "doc_id", "text", batchId = 2L).collect()
    assert(store.table(spark).count() == before,
      "replayed batchId must not merge postings twice")
  }

  private val s0 = Seq(("web", 10L, "alpha beta gamma alpha"),
    ("book", 11L, "delta delta epsilon"))
  private val s1 = Seq(("web", 12L, "alpha alpha zeta"),
    ("book", 13L, "delta eta"))
  private val s2 = Seq(("web", 14L, "totally novel vocabulary here"))

  private def inlineBySource(batch: Seq[(String, Long, String)],
      prior: Seq[(String, Long, String)]): Set[(String, Long, Long, Double)] =
    TextAnalysis.jsDriftBySource(batch.toDF("source", "doc_id", "text"),
        prior.toDF("source", "doc_id", "text"), "source", "text")
      .as[(String, Long, Long, Double)].collect().toSet

  test("per-source drift-at-ingest == inline per-source drift vs all prior batches") {
    val store = new graft.operators.TermHistStore(
      "graft_drift_src_ingest", buckets = 2)

    def monitor(batchId: Long,
        docs: Seq[(String, Long, String)]): Set[(String, Long, Long, Double)] =
      StreamingPipelines.driftBySourceMonitorBatch(store,
          docs.toDF("source", "doc_id", "text"), "source", "text",
          batchId = batchId)
        .as[(String, Long, Long, Double)].collect().toSet

    // first batch: no baseline for ANY source → zero rows, sliver merged
    assert(monitor(0L, s0).isEmpty, "no drift rows against an empty store")
    // horizon 1: monitor == inline vs s0, one row PER SOURCE
    val d1 = monitor(1L, s1)
    assert(d1 == inlineBySource(s1, s0))
    assert(d1.map(_._1) == Set("web", "book"))
    // horizon 2: only "web" arrives → only web's row; baseline is the
    // store's fold of s0 ++ s1 (novel vocab ⇒ ≈ ln 2)
    val d2 = monitor(2L, s2)
    assert(d2 == inlineBySource(s2, s0 ++ s1))
    assert(d2.map(_._1) == Set("web"))
    assert(math.abs(d2.head._4 - math.log(2)) <= 0.0002, s"got $d2")

    // replay of batch 2: the merge must not double-count the histogram
    val before = store.histogram(spark).as[(String, String, Long)]
      .collect().toSet
    StreamingPipelines.driftBySourceMonitorBatch(store,
      s2.toDF("source", "doc_id", "text"), "source", "text",
      batchId = 2L).collect()
    assert(store.histogram(spark).as[(String, String, Long)]
      .collect().toSet == before,
      "replayed batchId must not merge the histogram twice")

    // compaction folds segments without changing the baseline
    store.compact(spark)
    assert(store.liveSegments.size == 1)
    assert(store.histogram(spark).as[(String, String, Long)]
      .collect().toSet == before,
      "compaction must preserve the folded histogram")
  }

  test("monitor loop drives from a real stream via foreachBatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new LexStore("graft_drift_ingest_stream", buckets = 2)
    val drifts = scala.collection.mutable.ArrayBuffer[Double]()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF.toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = StreamingPipelines.driftMonitorBatch(store, batch,
            "doc_id", "text", batchId = batchId)
          .as[(Long, Long, Double)].collect()
        drifts.synchronized { drifts ++= rows.map(_._3) }
        ()
      }.start()
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
      assert(drifts.toSeq == inlineDrift(b1, b0).map(_._3),
        s"got $drifts")
    } finally q.stop()
  }
}
