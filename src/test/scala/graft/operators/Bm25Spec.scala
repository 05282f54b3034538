package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** BM25 lexical search ([[TextAnalysis.bm25Search]]): scores against a
  * hand-rolled reference on a tiny corpus, ranking/tie discipline, and
  * the posting-list plan shape. Cross-engine value parity runs at the
  * driver gate (bm25_search vs the DuckDB twin). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def refBm25(docs: Map[Long, String], query: Seq[String],
      id: Long): Double = {
    val k1 = TextAnalysis.Bm25K1; val b = TextAnalysis.Bm25B
    val toks = docs.map { case (d, t) => d -> t.split(" ").toSeq }
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.length).sum.toDouble / n
    val dl = toks(id).length.toDouble
    query.map { t =>
      val df = toks.values.count(_.contains(t)).toDouble
      val tf = toks(id).count(_ == t).toDouble
      if (tf == 0) 0.0
      else {
        val idf = BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }
    }.sum
  }

  test("scores match the reference formula; repetition saturates; shorter doc wins ties") {
    val docs = Map(
      1L -> "cat dog cat bird lake tree",          // tf(cat)=2, short
      2L -> "cat fish stone stone stone stone stone stone stone stone", // tf=1, long
      3L -> "dog wolf bear lion tiger puma"        // no cat
    )
    val out = TextAnalysis.bm25Search(
      docs.toSeq.toDF("doc_id", "text"),
      "doc_id", "text",
      Seq((7L, "cat")).toDF("query_id", "term"))
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 2L), s"got ${out.toSeq}")
    out.foreach { case (_, d, score, _) =>
      val want = BigDecimal(refBm25(docs, Seq("cat"), d))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - want) < 5e-4, s"doc $d: $score vs $want")
    }
    // doc 1 beats doc 2: higher tf AND shorter (length normalization)
    assert(out.head._3 > out.last._3)
  }

  test("multi-term queries sum per-term contributions; non-matching docs absent") {
    val out = graft.packs.TextOps.bm25Search(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= TextAnalysis.Bm25TopK)
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to rows.length).toSeq)
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 >= b._3, s"query $q: rank order violates score order")
      }
      assert(rows.forall(_._3 > 0.0), "only matching docs may appear")
    }
  }

  test("hybrid RRF: bounds, rank discipline, both-systems docs dominate singletons") {
    val out = graft.packs.TextOps.hybridSearchRrf(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    val maxSingle = 1.0 / (graft.packs.TextOps.RrfK + 1)      // best one-system score
    val maxFused = 2.0 / (graft.packs.TextOps.RrfK + 1)       // rank 1 in BOTH
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= TextAnalysis.Bm25TopK)
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to rows.length).toSeq)
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 >= b._3, s"query $q: fused rank order violates score order")
      }
      // scores are round-4, so the ceilings get half-ulp-of-round-4 slack
      rows.foreach { case (_, _, s, _) =>
        assert(s > 0.0 && s <= maxFused + 5e-5)
      }
      // any doc scoring above the one-system ceiling must be in BOTH
      // top-10s — cross-check against the lexical side
      val lexTop = graft.packs.TextOps.bm25Search(spark, sf)
        .filter(col("query_id") === q).select(col("doc_id"))
        .as[Long].collect().toSet
      rows.filter(_._3 > maxSingle + 5e-5).foreach { case (_, d, _, _) =>
        assert(lexTop.contains(d),
          s"query $q: doc $d fused above the single-system ceiling " +
            "but is not in the BM25 top-10")
      }
    }
  }

  test("store probe == inline ranking; no tokenization above the posting scan") {
    val inline = graft.packs.TextOps.bm25Search(spark, sf)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val stored = graft.packs.TextOps.bm25SearchStore(spark, sf)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    assert(inline.nonEmpty && inline.toSeq == stored.toSeq)
    val p = graft.packs.TextOps.bm25SearchStore(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("split("),
      s"the store probe must never re-tokenize the corpus:\n$p")
  }

  test("plan: posting restriction first, heap top-k, no vocabulary broadcast of df onto tf") {
    val p = graft.packs.TextOps.bm25Search(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("graft_topk"), s"ranking must be the heap aggregate:\n$p")
    assert(!p.contains("Window"), s"no per-query window:\n$p")
    assert(p.contains("LeftSemi"), s"tokens must semi-join the query terms:\n$p")
  }
}
