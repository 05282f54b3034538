package graft.operators

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  /** 3 clusters of 20 vectors each (dim 64) around near-orthogonal
    * seeded-random bases with small noise → planted neighbor structure. */
  private lazy val clustered = {
    val rnd = new Random(7)
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

  test("hard negatives: nearest DIFFERENT-label vectors only, own cluster excluded") {
    val labeled = clustered.withColumn("label",
      (org.apache.spark.sql.functions.col("vec_id") / 100).cast("int"))
    val q = labeled.where("vec_id IN (0, 100, 200)")
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_emb"),
        org.apache.spark.sql.functions.col("label").as("q_label"))
    val out = SimilaritySearch.hardNegativesTopK(labeled, q, k = 10)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.length == 30)
    out.foreach { case (qid, vid, sim, _) =>
      assert(vid / 100 != qid / 100,
        s"query $qid mined same-label $vid — negatives must cross labels")
      // near-orthogonal cluster bases: a cross-cluster sim is far below
      // the ≥0.8 same-cluster sims the positive top-k returns
      assert(sim < 0.8, s"suspiciously positive-like negative: $sim")
    }
    // the negatives are still the HARDEST available: re-ranking all
    // cross-label candidates by hand must give the same top-10 set
    val all = labeled.as[(Long, Seq[Float], Int)].collect()
    val byId = all.map(r => r._1 -> r._2).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    Seq(0L, 100L, 200L).foreach { qid =>
      val want = all.filter(r => r._1 / 100 != qid / 100)
        .map(r => (BigDecimal(cos(byId(qid), r._2))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, r._1))
        .sortBy { case (s0, id) => (-s0, id) }.take(10).map(_._2).toSet
      val got = out.filter(_._1 == qid).map(_._2).toSet
      assert(got == want, s"query $qid: $got != $want")
    }
  }

  test("brute-force topk returns same-cluster neighbors, ranked") {
    val out = SimilaritySearch.bruteForceTopK(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.length == 30)
    // every neighbor of query c*100 is from cluster c
    out.foreach { case (qid, vid, sim, _) =>
      assert(vid / 100 == qid / 100, s"query $qid got cross-cluster $vid")
      assert(sim > 0.8)
    }
    // ranks are 1..10 per query, sims non-increasing
    val byQ = out.groupBy(_._1)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to 10L))
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse == sorted.map(_._3).toSeq)
    }
  }

  test("int8-quantized topk: high recall vs exact, same-cluster neighbors") {
    val brute = SimilaritySearch.bruteForceTopK(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    val int8 = SimilaritySearch.bruteForceTopKInt8(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
    assert(int8.length == 30)
    // quantization error ~1e-2 is far inside the cluster/non-cluster gap
    int8.foreach { case (qid, vid, sim, _) =>
      assert(vid / 100 == qid / 100, s"query $qid got cross-cluster $vid")
      assert(sim > 0.75 && sim <= 1.0001, s"quantized sim out of range: $sim")
    }
    val recall = (brute & int8.map(r => (r._1, r._2)).toSet).size.toDouble /
      brute.size
    assert(recall >= 0.9, s"int8 recall $recall too low")
  }

  test("hamming topk: same-cluster neighbors, whole-number sims, deterministic") {
    val out = SimilaritySearch.bruteForceTopKHamming(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.length == 30)
    out.foreach { case (qid, vid, sim, _) =>
      assert(vid / 100 == qid / 100, s"query $qid got cross-cluster $vid")
      assert(sim == sim.floor && sim >= 0 && sim <= 64,
        s"hamming sim must be a whole agreeing-bit count: $sim")
      // within-cluster angular similarity is high → most sign bits agree
      assert(sim >= 48, s"same-cluster neighbor with implausibly low bit agreement: $sim")
    }
    val again = SimilaritySearch.bruteForceTopKHamming(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.sortBy(r => (r._1, r._4)).toSeq == again.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("LSH topk achieves high recall vs brute force on clustered data") {
    val brute = SimilaritySearch.bruteForceTopK(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    val lsh = SimilaritySearch.lshTopK(clustered, queryOf, k = 10)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
  }

  test("LSH near-dup pairs recover the brute-force pairs on clustered data") {
    val brute = SimilaritySearch.cosineNearDupPairs(clustered, 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(brute.nonEmpty)
    val lsh = SimilaritySearch.lshNearDupPairs(clustered, 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"LSH near-dup recall $recall")
    assert(lsh.subsetOf(brute), "verification must keep precision exact")
  }

  test("cosine pairs: identical vectors sim 1.0, orthogonal filtered out") {
    val vecs = Seq(
      (1L, Array.fill(64)(1.0f).toSeq),
      (2L, Array.fill(64)(1.0f).toSeq),
      (3L, (Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)).toSeq))
      .toDF("vec_id", "embedding")
    val pairs = SimilaritySearch.cosineNearDupPairs(vecs, 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("incremental probe: seen dups caught, batch pairs once, corpus never re-paired") {
    val base = Array.fill(64)(1.0f)
    def noisy(seed: Int) = {
      val r = new Random(seed)
      base.map(x => x + 0.01f * r.nextGaussian().toFloat).toSeq
    }
    val ortho = (Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)).toSeq
    val seen = Seq(
      (1L, noisy(1)), (2L, noisy(2)),       // (1,2) is seen-seen
      (3L, ortho))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      (20L, noisy(3)),                      // near-dup of SEEN 1 and 2
      (21L, ortho.map(-_)), (22L, ortho.map(-_))) // batch-internal pair
      .toDF("vec_id", "embedding")
    val got = SimilaritySearch
      .incrementalLshNearDupPairs(batch, seen, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    val ids = got.map(p => (p._1, p._2))
    assert(ids.length == ids.toSet.size, s"pairs must emit once: ${ids.toList}")
    assert(ids.contains((1L, 20L)) && ids.contains((2L, 20L)),
      s"planted near-dup of a SEEN vector must be caught: ${ids.toList}")
    assert(ids.contains((21L, 22L)),
      s"batch-internal near-dup must be caught: ${ids.toList}")
    assert(!ids.contains((1L, 2L)),
      "seen-seen pairs must never re-emit from an incremental probe")
    // equivalence the oracle gate relies on: probe == self-dedup over
    // batch ∪ seen restricted to pairs touching the batch
    val all = seen.unionByName(batch)
    val want = SimilaritySearch.lshNearDupPairs(all, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
      .filter(p => p._1 >= 20L || p._2 >= 20L).toSet
    assert(got.toSet == want,
      s"extra=${got.toSet -- want} missing=${want -- got.toSet}")
  }

  test("over-cap buckets dropped whole on both forms; small buckets kept") {
    // 6 byte-identical vectors share every table's bucket; cap 4 drops
    // the family. The distinct near-pair survives in its own buckets.
    val dup = Array.fill(64)(1.0f).toSeq
    val ortho = (Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)).toSeq
    val vecs = ((1L to 6L).map(i => (i, dup)) ++
      Seq((10L, ortho), (11L, ortho))).toDF("vec_id", "embedding")
    val capped = SimilaritySearch
      .lshNearDupPairs(vecs, threshold = 0.9, maxBucketSize = 4)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(capped == Set((10L, 11L)),
      s"over-cap family must drop whole, survivor pair kept: $capped")
    val uncapped = SimilaritySearch.lshNearDupPairs(vecs, threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((10L, 11L)),
      s"default cap must keep the small corpus intact: $uncapped")
    // probe form: batch vector joining an over-cap seen family is capped
    val probeCapped = SimilaritySearch
      .incrementalLshNearDupPairs(
        Seq((20L, dup)).toDF("vec_id", "embedding"),
        vecs, threshold = 0.9, maxBucketSize = 4)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(probeCapped.isEmpty, s"got $probeCapped")
  }

  test("semantic contamination: planted leak flagged, orthogonal clean, corpus covered") {
    val base = Array.fill(64)(0.0f); base(0) = 1.0f
    val ortho = Array.fill(64)(0.0f); ortho(1) = 1.0f
    val near = Array.fill(64)(0.0f); near(0) = 0.9f; near(1) = 0.1f
    val eval = Seq((100L, base.toSeq)).toDF("vec_id", "embedding")
    val corpus = Seq((1L, base.toSeq), (2L, near.toSeq), (3L, ortho.toSeq))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch
      .semanticContamination(corpus, eval, threshold = 0.9)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L),
      "every corpus vector gets a verdict row")
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 && byId(1L)._3 == 1.0 && byId(1L)._2 == 1L)
    assert(byId(2L)._4, "0.994 cosine is a leak at 0.9")
    assert(!byId(3L)._4 && byId(3L)._2 == 0L && byId(3L)._3 == 0.0)
  }

  test("semantic contamination: store-probed form == inline on real fixtures") {
    val inline = graft.packs.SimilarityOps
      .decontaminateSemantic(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val stored = graft.packs.SimilarityOps
      .decontaminateSemanticStore(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(inline.nonEmpty && inline == stored)
  }

  test("dim curve: full-dim recall is exactly 1, all rows bounded") {
    val out = graft.packs.SimilarityOps.annDimCurve(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq ==
      graft.packs.SimilarityOps.AnnCurveDims.map(_.toLong))
    out.foreach { case (_, hits, nq, recall) =>
      assert(nq > 0L && hits >= 0L && hits <= nq * 10L)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    val full = out.last
    assert(full._1 == 64L && full._4 == 1.0,
      s"d=64 truncation is the identity, recall must be 1.0: $full")
  }

  test("rank metrics: bounded, consistent with recall, perfect when IVF == brute") {
    val metrics = graft.packs.SimilarityOps.annRankMetrics(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(metrics.nonEmpty)
    metrics.foreach { case (q, hits, mrr, ndcg) =>
      assert(hits >= 0L && hits <= 10L, s"query $q: hits $hits")
      assert(mrr >= 0.0 && mrr <= 1.0, s"query $q: mrr $mrr")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"query $q: ndcg $ndcg")
      // binary-relevance facts: no hits ⇔ both metrics zero; a full
      // intersection can only score ndcg 1.0 if the ORDER matches too,
      // but mrr = 1.0 requires the rank-1 result to be relevant
      if (hits == 0L) assert(mrr == 0.0 && ndcg == 0.0)
      if (ndcg == 1.0) assert(hits == 10L && mrr == 1.0)
    }
    // n_hits must agree with ann_recall's hits per query (same inputs,
    // same relevance rule — only the rank math differs)
    val recall = graft.packs.SimilarityOps.annRecall(spark, sf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    metrics.foreach { case (q, hits, _, _) =>
      assert(recall(q) == hits, s"query $q: recall hits ${recall(q)} != $hits")
    }
  }

  test("MMR: first pick is the relevance top-1; a diverse result beats a duplicate") {
    // query BETWEEN two clusters: vectors 1 and 2 are near-identical
    // (cluster A, the more relevant), vector 3 sits in cluster B. Pure
    // relevance ranks (1, 2, 3): sim(2) ≈ 0.92 > sim(3) ≈ 0.86. But 2
    // is redundant with the already-picked one (psim ≈ 1.0) while 3 is
    // not (psim = 0.6): the redundant cluster-A twin scores ≈ 0.34 vs
    // ≈ 0.42 for 3 — the diverse pick must take rank 2
    def vec(x: Double, y: Double): Seq[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = x.toFloat; a(1) = y.toFloat
      a.toSeq
    }
    val vectors = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(0.999, 0.04)), (3L, vec(0.6, 0.8))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, vec(0.92, 0.39))).toDF("query_id", "q_emb")
    val shortlist = SimilaritySearch.bruteForceTopK(vectors, queries, 3)
    val mmr = SimilaritySearch.mmrRerank(shortlist, vectors, selectK = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(mmr.map(r => (r._2, r._3)).toSeq == Seq((1L, 2L), (2L, 3L), (3L, 1L)),
      s"expected picks (2, 3, 1), got ${mmr.toSeq}")

    // real corpus: exactly selectK distinct picks per query, ranks 1..k,
    // rank-1 == the brute top-1
    val brute = graft.packs.SimilarityOps.annBrute(spark, sf)
    val top1 = brute.filter(col("rk") === 1L)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toMap
    val out = graft.packs.SimilarityOps.annMmr(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == SimilaritySearch.MmrSelectK)
      assert(rows.map(_._2).sorted.toSeq ==
        (1L to SimilaritySearch.MmrSelectK.toLong).toSeq)
      assert(rows.map(_._3).distinct.length == rows.length)
      assert(rows.minBy(_._2)._3 == top1(q), s"query $q rank-1 drifted")
    }
  }
}
