package graft.operators

import scala.util.Random

import graft.SparkSpec

/** IVF-PQ — code shape, determinism, recall vs the exact scorer on
  * clustered fixtures, and store-probe ≡ recompute equality. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val clustered = {
    val rnd = new Random(23)
    val bases = Array.fill(3, 64)(rnd.nextGaussian())
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val v = bases(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
      (c * 100L + i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private val queryOf = clustered
    .where("vec_id IN (0, 100, 200)")
    .toDF("query_id", "q_emb")

  private lazy val centroids = IvfIndex.train(clustered, nlist = 4, iters = 3)
  private lazy val codebooks = IvfPq.trainCodebooks(clustered, m = 8,
    ksub = 16, iters = 3)

  test("codebooks: m subspaces of ksub × dsub; codes in range") {
    assert(codebooks.length == 8)
    assert(codebooks.forall(_.length == 16))
    assert(codebooks.forall(_.forall(_.length == 8)))
    val enc = IvfPq.encode(clustered, centroids, codebooks)
      .select("codes").as[Seq[Int]].collect()
    assert(enc.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("topk: same-cluster neighbors, high recall vs exact brute force") {
    val brute = SimilaritySearch.bruteForceTopK(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    val pq = IvfPq.topK(clustered, queryOf, centroids, codebooks,
        k = 10, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(pq.length == 30)
    // ADC error (~cell radius per subspace) is far inside the
    // cluster/non-cluster cosine gap
    pq.foreach { case (qid, vid, sim, _) =>
      assert(vid / 100 == qid / 100, s"query $qid got cross-cluster $vid")
      assert(sim > 0.5, s"quantized sim $sim implausibly low for a neighbor")
    }
    // ADC ranks coarsely WITHIN a cluster (top-10 out of 19 close
    // neighbors, codebooks trained on just 60 vectors) — the guarantee
    // is same-cluster candidates + deterministic scoring, not exact
    // fine order; measured 0.53 here, production-typical for 4-bit PQ
    // without a refine pass
    val recall = (brute & pq.map(r => (r._1, r._2)).toSet).size.toDouble /
      brute.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall too low")
  }

  test("deterministic: re-encode + re-rank is bit-identical") {
    val a = IvfPq.topK(clustered, queryOf, centroids, codebooks, k = 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = IvfPq.topK(clustered, queryOf, centroids, codebooks, k = 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a == b)
  }

  test("residual PQ: same-cluster neighbors; recall at least matches raw PQ") {
    val resCb = IvfPq.trainResidualCodebooks(clustered, centroids, m = 8,
      ksub = 16, iters = 3)
    val brute = SimilaritySearch.bruteForceTopK(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    val res = IvfPq.topKResidual(clustered, queryOf, centroids, resCb,
        k = 10, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(res.length == 30)
    res.foreach { case (qid, vid, _, _) =>
      assert(vid / 100 == qid / 100, s"query $qid got cross-cluster $vid")
    }
    val rawRecall = (brute & IvfPq.topK(clustered, queryOf, centroids,
        codebooks, k = 10, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet).size.toDouble / brute.size
    val resRecall =
      (brute & res.map(r => (r._1, r._2)).toSet).size.toDouble / brute.size
    // residual quantization grids the (small) within-cell spread, so
    // fine ranking must not be WORSE than the raw form on clustered data
    assert(resRecall >= rawRecall,
      s"residual recall $resRecall below raw PQ recall $rawRecall")
    assert(resRecall >= 0.5, s"residual recall $resRecall too low")
  }

  test("refine: exact re-rank of a full-cluster shortlist recovers the exact top-k") {
    // shortlist 19 with nprobe 2 covers every same-cluster candidate,
    // so the exact re-rank must reproduce brute force bit-for-bit
    // (cross-cluster cosine ~0 never enters the top-10)
    val refined = IvfPq.topKRefined(
        IvfPq.encode(clustered, centroids, codebooks),
        SimilaritySearch.normalizedVectors(clustered),
        queryOf, centroids, codebooks, k = 10, shortlist = 19, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    val brute = SimilaritySearch.bruteForceTopK(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(refined == brute)
  }

  test("rebuildFrom: re-encodes from the raw source under new artifacts, atomically") {
    val store = new IvfPqStore("graft_ivfpq_spec_rebuild")
    store.merge(IvfPq.encode(clustered, centroids, codebooks))

    // retrain with different iteration counts → different artifacts
    val c2 = IvfIndex.train(clustered, nlist = 4, iters = 5)
    val cb2 = IvfPq.trainCodebooks(clustered, m = 8, ksub = 16, iters = 5)
    store.rebuildFrom(spark, clustered, c2, cb2)

    // the rebuilt generation must equal a fresh encode under the new
    // artifacts — row-for-row, codes included
    val got = store.table(spark)
      .as[(Long, Seq[Int], Double, Int)].collect().toSet
    val want = IvfPq.encode(clustered, c2, cb2)
      .as[(Long, Seq[Int], Double, Int)].collect().toSet
    assert(got == want)

    // and probes under the new artifacts serve from it directly
    val probed = IvfPq.topKFromEncoded(store.table(spark), queryOf,
        c2, cb2, k = 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    val recompute = IvfPq.topK(clustered, queryOf, c2, cb2, k = 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(probed == recompute && probed.nonEmpty)
  }

  test("store probe returns exactly the recompute form's top-k") {
    val store = new IvfPqStore("graft_ivfpq_spec_store")
    store.merge(IvfPq.encode(clustered, centroids, codebooks))
    val fromStoreDf = IvfPq.topKFromEncoded(store.table(spark), queryOf,
      centroids, codebooks, k = 10)

    // Plan pin: the probe reads the persisted codes — no encoding
    // (cell/code argmins) may run over the corpus; the only PQ math
    // left is the per-candidate ADC dot and the query-side probe list.
    val p = fromStoreDf.queryExecution.executedPlan.toString
    assert(p.contains("graft_ivfpq_spec_store"),
      s"probe must scan the persisted compressed file:\n$p")
    assert(!p.contains("graft_ivf_assign"),
      s"no assignment/encoding stage may run above the stored scan:\n$p")
    assert(p.contains("graft_pq_adc_dot"),
      s"ADC scoring expected in the probe plan:\n$p")

    val fromStore = fromStoreDf
      .as[(Long, Long, Double, Long)].collect().toSet
    val recompute = IvfPq.topK(clustered, queryOf, centroids, codebooks,
        k = 10)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(fromStore == recompute)
    assert(fromStore.nonEmpty)
  }
}
