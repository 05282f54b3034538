package graft.streaming

import scala.util.Random

import graft.SparkSpec
import graft.operators.{IvfIndex, IvfPq, IvfPqStore, IvfStore}

/** SemDeDup at ingest over the shared IVF inverted file, and PQ
  * compressed-index maintenance: sequential batches dedup-gate the
  * store, replays are no-ops, and the SAME store serves ANN probes. */
class SemanticIngestSpec extends SparkSpec {
  import spark.implicits._

  private val baseA = Array.fill(64)(1.0f)
  private val baseB = Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)
  private val baseC =
    Array.tabulate(64)(i => if (i % 32 < 16) 1.0f else -1.0f)
  private def noisy(base: Array[Float], seed: Int): Seq[Float] = {
    val r = new Random(seed)
    base.map(x => x + 0.01f * r.nextGaussian().toFloat).toSeq
  }

  // quantizer trained offline on a representative draw (the faiss
  // story); frozen across the whole ingest sequence
  private lazy val centroids = {
    val seed = (0 until 3).flatMap { s =>
      Seq((s * 10L, noisy(baseA, 100 + s)), (s * 10L + 1, noisy(baseB, 200 + s)),
        (s * 10L + 2, noisy(baseC, 300 + s)))
    }
    IvfIndex.train(seed.toDF("vec_id", "embedding"), nlist = 3, iters = 3)
  }

  test("sequential semantic ingest: dups drop across batches, store stays dedup-gated, replay no-ops") {
    val store = new IvfStore("graft_semantic_ingest", buckets = 2)

    def ingest(batchId: Long, vecs: (Long, Seq[Float])*): Set[Long] =
      StreamingPipelines.semanticDedupIngestBatch(store, centroids,
          vecs.toDF("vec_id", "embedding"), threshold = 0.9,
          batchId = batchId)
        .select("vec_id").as[Long].collect().toSet

    // batch 0: internal near-dup pair (10, 11) → 11 drops; 12 fresh
    assert(ingest(0L, (10L, noisy(baseA, 1)), (11L, noisy(baseA, 2)),
      (12L, noisy(baseB, 3))) == Set(10L, 12L))

    // batch 1: 20 near-dups ACCEPTED 10 → drops via the store probe;
    // 21 fresh; 22 near-dups 21 batch-internally → drops
    assert(ingest(1L, (20L, noisy(baseA, 4)), (21L, noisy(baseC, 5)),
      (22L, noisy(baseC, 6))) == Set(21L))

    // batch 2: 30 near-dups the batch-1 survivor 21; 31 near-dups the
    // DROPPED 11's canonical 10 — both drop
    assert(ingest(2L, (30L, noisy(baseC, 7)), (31L, noisy(baseA, 8))) ==
      Set.empty[Long])

    assert(store.table(spark).select("vec_id").as[Long].collect().toSet ==
      Set(10L, 12L, 21L))

    // at-least-once replay of batch 1: same survivors, no store growth
    val n = store.table(spark).count()
    val replay = StreamingPipelines.semanticDedupIngestBatch(store,
      centroids, Seq((20L, noisy(baseA, 4)), (21L, noisy(baseC, 5)),
        (22L, noisy(baseC, 6))).toDF("vec_id", "embedding"),
      threshold = 0.9, batchId = 1L)
    assert(replay.select("vec_id").as[Long].collect().toSet == Set(21L))
    assert(store.table(spark).count() == n)

    // the SAME store serves ANN: a fresh query vector near baseC finds
    // the accepted 21, and never a dropped id
    val hits = IvfIndex.topKFromIndexed(store.table(spark),
        Seq((900L, noisy(baseC, 9))).toDF("query_id", "q_emb"),
        centroids, k = 1, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(hits == Set(21L))
  }

  test("PQ ingest: encoded merges accumulate, replay no-ops, probe == recompute") {
    val store = new IvfPqStore("graft_pq_ingest", buckets = 2)
    val all = Seq((10L, noisy(baseA, 1)), (11L, noisy(baseB, 2)),
      (20L, noisy(baseC, 3)), (21L, noisy(baseA, 4)))
    val codebooks = IvfPq.trainCodebooks(all.toDF("vec_id", "embedding"),
      m = 8, ksub = 4, iters = 3)

    StreamingPipelines.annPqIngestBatch(store, centroids, codebooks,
      all.take(2).toDF("vec_id", "embedding"), batchId = 0L)
    StreamingPipelines.annPqIngestBatch(store, centroids, codebooks,
      all.drop(2).toDF("vec_id", "embedding"), batchId = 1L)
    assert(store.table(spark).select("vec_id").as[Long].collect().toSet ==
      Set(10L, 11L, 20L, 21L))

    val n = store.table(spark).count()
    StreamingPipelines.annPqIngestBatch(store, centroids, codebooks,
      all.drop(2).toDF("vec_id", "embedding"), batchId = 1L)
    assert(store.table(spark).count() == n, "replay must not grow the store")

    val queries = Seq((900L, noisy(baseA, 9))).toDF("query_id", "q_emb")
    val fromStore = IvfPq.topKFromEncoded(store.table(spark), queries,
        centroids, codebooks, k = 2, nprobe = 1)
      .as[(Long, Long, Double, Long)].collect().toSet
    val recompute = IvfPq.topK(all.toDF("vec_id", "embedding"), queries,
        centroids, codebooks, k = 2, nprobe = 1)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(fromStore == recompute)
    assert(fromStore.map(_._2).subsetOf(Set(10L, 21L)),
      "baseA query must hit the baseA vectors")
  }
}
