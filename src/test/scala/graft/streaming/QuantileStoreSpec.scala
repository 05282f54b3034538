package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QuantileStore

/** The quantile-state ingest loop ([[StreamingPipelines
  * .quantileIngestBatch]]): sequential batches partial-agg once and
  * merge histogram segments; the frequency-weighted exact percentile
  * over the accumulated store must equal the inline exact percentile
  * over the concatenated corpus at EVERY horizon (histogram addition
  * commutes — the quantile family's stream == batch symmetry, matching
  * the floor family's), and an at-least-once replay must not
  * double-count mass. */
class QuantileStoreSpec extends SparkSpec {
  import spark.implicits._

  private val b0 = Seq(
    ("A", 100L), ("A", 200L), ("A", 300L), ("A", 300L),
    ("B", 50L), ("B", 70L))
  private val b1 = Seq(
    ("A", 150L), ("A", 9000L),
    ("B", 70L), ("B", 10L), ("B", 80L))

  private def inline(rows: Seq[(String, Long)]): Set[(String, Double, Double, Long)] =
    key(rows.toDF("g", "v")
      .groupBy(col("g"))
      .agg(expr("percentile(v, array(0.5D, 0.95D))").as("qs"),
        count(lit(1)).as("n")))

  private def key(df: DataFrame): Set[(String, Double, Double, Long)] =
    df.select(col("g"), col("qs").getItem(0), col("qs").getItem(1), col("n"))
      .as[(String, Double, Double, Long)].collect().toSet

  private def fromStore(store: QuantileStore): Set[(String, Double, Double, Long)] =
    key(store.quantiles(spark, Seq(0.5, 0.95)))

  test("sequential ingest: store fold == inline exact percentile at every horizon") {
    val store = new QuantileStore("graft_quantile_ingest_seq", buckets = 2)
    StreamingPipelines.quantileIngestBatch(store, b0.toDF("g", "v"),
      "g", col("v"), batchId = 0L)
    assert(fromStore(store) == inline(b0),
      "store after batch 0 must equal inline over batch 0")

    StreamingPipelines.quantileIngestBatch(store, b1.toDF("g", "v"),
      "g", col("v"), batchId = 1L)
    // the horizon quantiles depend on CROSS-batch ranks (batch 1's 9000
    // moves A's p95; its 10 moves B's p50) — proving the read folds the
    // segment union, never per-segment quantiles
    assert(fromStore(store) == inline(b0 ++ b1),
      "store after batch 1 must equal inline over batches 0+1")

    // at-least-once replay: zero histogram growth, zero rank shift
    val before = store.table(spark).agg(sum(col("c"))).head().getLong(0)
    StreamingPipelines.quantileIngestBatch(store, b1.toDF("g", "v"),
      "g", col("v"), batchId = 1L)
    assert(store.table(spark).agg(sum(col("c"))).head().getLong(0) == before,
      "replayed batchId must not double-count mass")
    assert(fromStore(store) == inline(b0 ++ b1),
      "replay must not change quantiles")
  }

  test("ingest loop compacts on its segment budget; quantiles survive the fold") {
    val store = new QuantileStore("graft_quantile_ingest_cadence", buckets = 2)
    StreamingPipelines.quantileIngestBatch(store, b0.toDF("g", "v"),
      "g", col("v"), batchId = 0L, maxSegments = 1)
    StreamingPipelines.quantileIngestBatch(store, b1.toDF("g", "v"),
      "g", col("v"), batchId = 1L, maxSegments = 1)
    assert(store.liveSegments.size == 1,
      s"segment budget not enforced by the loop: ${store.liveSegments}")
    assert(fromStore(store) == inline(b0 ++ b1),
      "compaction must not change quantiles")
  }

  test("the store's exact fold verifies the approx sketch's rank claim at the seam") {
    // the percentiles_approx gate discipline, served from the store:
    // the exact side of the sketch's rank claim comes from the FOLDED
    // histogram, never a corpus re-scan. At this spec's n=6 a ±1%
    // rank window is narrower than one rank, so the window here is the
    // sketch's discrete contract at n ≪ accuracy: the returned value
    // must be an order statistic within ±1 RANK of the target (the
    // sf-scale gate uses the ±1% form, 10× looser than configured).
    val store = new QuantileStore("graft_quantile_ingest_claim", buckets = 2)
    StreamingPipelines.quantileIngestBatch(store, b0.toDF("g", "v"),
      "g", col("v"), batchId = 0L)
    StreamingPipelines.quantileIngestBatch(store, b1.toDF("g", "v"),
      "g", col("v"), batchId = 1L)
    // expand the (tiny) folded histogram to sorted value lists — the
    // spec-side mirror of "value at rank r", driver-bounded by design
    val byGroup = store.histogram(spark)
      .as[(String, Long, Long)].collect().groupBy(_._1)
      .map { case (g, rows) =>
        g -> rows.sortBy(_._2).flatMap(r => Seq.fill(r._3.toInt)(r._2)).toVector
      }
    val approx = (b0 ++ b1).toDF("g", "v").groupBy(col("g"))
      .agg(expr("approx_percentile(v, 0.5D, 1000)").as("ap"))
      .as[(String, Long)].collect().toMap
    approx.foreach { case (g, ap) =>
      val vs = byGroup(g)
      val pos = 0.5 * (vs.size - 1)
      val lo = vs(math.max(0, math.floor(pos).toInt - 1))
      val hi = vs(math.min(vs.size - 1, math.ceil(pos).toInt + 1))
      assert(ap >= lo && ap <= hi,
        s"group $g: approx p50 $ap outside store-derived rank window [$lo, $hi] of $vs")
    }
  }

  test("ingest loop drives from a real stream via foreachBatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new QuantileStore("graft_quantile_ingest_stream", buckets = 2)
    val in = MemoryStream[(String, Long)]
    val q = in.toDF.toDF("g", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingPipelines.quantileIngestBatch(store, batch, "g", col("v"),
          batchId = batchId)
        ()
      }.start()
    try {
      in.addData(b0: _*)
      q.processAllAvailable()
      assert(fromStore(store) == inline(b0),
        "streamed horizon 0 must equal batch over batch 0")
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(fromStore(store) == inline(b0 ++ b1),
        "streamed store must equal batch over everything ingested")
    } finally q.stop()
  }
}
