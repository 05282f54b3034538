package graft.streaming

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.EmbStore

/** The store-backed incremental near-dup ingest loop on the VECTOR
  * side: sequential batches probe the persisted bucket + vector
  * tables, drop near-dups of the accepted corpus (and later
  * batch-internal dups), and ingest only survivors — with
  * at-least-once replay a no-op on both tables. */
class EmbIngestSpec extends SparkSpec {
  import spark.implicits._

  // three mutually-orthogonal base directions in R^64; noisy variants
  // sit at cosine ~0.9999 of their base (near-dups at threshold 0.9),
  // cross-base cosine is ~0 (never near-dups)
  private val baseA = Array.fill(64)(1.0f)
  private val baseB = Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)
  private val baseC =
    Array.tabulate(64)(i => if (i % 32 < 16) 1.0f else -1.0f)
  private def noisy(base: Array[Float], seed: Int): Seq[Float] = {
    val r = new Random(seed)
    base.map(x => x + 0.01f * r.nextGaussian().toFloat).toSeq
  }

  test("sequential ingest: corpus dups drop across batches, survivors accumulate in both tables") {
    val store = new EmbStore("graft_emb_ingest", buckets = 2)

    def ingest(batchId: Long, vecs: (Long, Seq[Float])*): Set[Long] =
      StreamingPipelines.embNearDupIngestBatch(store,
          vecs.toDF("vec_id", "embedding"), threshold = 0.9,
          batchId = batchId)
        .select("vec_id").as[Long].collect().toSet

    // batch 0: internal near-dup pair (10, 11) → 11 drops; 12 fresh
    val b0 = ingest(0L, (10L, noisy(baseA, 1)), (11L, noisy(baseA, 2)),
      (12L, noisy(baseB, 3)))
    assert(b0 == Set(10L, 12L), s"got $b0")

    // batch 1: 20 near-dups ACCEPTED 10 → drops via the store probe;
    // 21 fresh; 22 near-dups 21 (batch-internal) → drops
    val b1 = ingest(1L, (20L, noisy(baseA, 4)), (21L, noisy(baseC, 5)),
      (22L, noisy(baseC, 6)))
    assert(b1 == Set(21L), s"got $b1")

    // batch 2: 30 near-dups the batch-1 SURVIVOR 21 → drops (proves
    // batch-1 survivors' buckets are live in the store); 31 would
    // near-dup the DROPPED 11 only via its canonical 10 — it must
    // still drop against 10 (canonical's embedding is near-identical)
    val b2 = ingest(2L, (30L, noisy(baseC, 7)), (31L, noisy(baseA, 8)))
    assert(b2 == Set.empty, s"got $b2")

    // both tables carry survivors only, in lockstep
    assert(store.vectorRows(spark).select("vec_id").as[Long]
      .collect().toSet == Set(10L, 12L, 21L))
    assert(store.bucketRows(spark).select("vec_id").distinct().as[Long]
      .collect().toSet == Set(10L, 12L, 21L))

    // at-least-once replay of batch 1: same survivors, no store growth
    val (nb, nv) =
      (store.bucketRows(spark).count(), store.vectorRows(spark).count())
    val replay = StreamingPipelines.embNearDupIngestBatch(store,
      Seq((20L, noisy(baseA, 4)), (21L, noisy(baseC, 5)),
        (22L, noisy(baseC, 6))).toDF("vec_id", "embedding"),
      threshold = 0.9, batchId = 1L)
    assert(replay.select("vec_id").as[Long].collect().toSet == Set(21L),
      "replay computes the same survivors")
    assert(store.bucketRows(spark).count() == nb &&
      store.vectorRows(spark).count() == nv,
      "replayed batchId must not grow either table")
  }

  test("ingest loop drives from a real stream via foreachBatch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new EmbStore("graft_emb_ingest_stream", buckets = 2)
    val accepted = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = in.toDF.toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = StreamingPipelines.embNearDupIngestBatch(store, batch,
            threshold = 0.9, batchId = batchId)
          .select("vec_id").as[Long].collect()
        accepted.synchronized { accepted ++= out }
        ()
      }.start()
    try {
      in.addData((1L, noisy(baseA, 1)), (2L, noisy(baseB, 2)))
      q.processAllAvailable()
      in.addData((3L, noisy(baseA, 3))) // near-dup of accepted 1 → dropped
      q.processAllAvailable()
      assert(accepted.synchronized(accepted.toSet) == Set(1L, 2L),
        s"got ${accepted.synchronized(accepted.toSet)}")
    } finally q.stop()
  }
}
