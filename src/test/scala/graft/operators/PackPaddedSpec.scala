package graft.operators

import graft.{SparkSpec, Tables}
import graft.packs.TextOps

/** Padded sequence packing: document-boundary isolation (no avoidable
  * straddling), exact stream reconstruction from pad_before, a planted
  * longer-than-budget straddler, rerun determinism, and the
  * one-exchange/one-sort plan. */
class PackPaddedSpec extends SparkSpec {
  import spark.implicits._

  private val B = TextOps.PackBudget

  private type Row8 = (Long, Long, Long, Long, Long, Long, Long, Long)

  /** Reference fold of the padded layout, per shard in pos order. */
  private def assertPaddedLayout(rows: Seq[Row8], budget: Long): Unit =
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(_._3)
      assert(inOrder.map(_._3) == (1L to rs.length).toSeq,
        s"shard $shard: positions must be 1..n contiguous")
      var nextSeq = 0L
      var nextOff = 0L
      inOrder.foreach { case (id, _, _, n, first, last, off, pad) =>
        val expPad = if (nextOff > 0 && nextOff + n > budget) budget - nextOff else 0L
        val expSeq = if (expPad > 0) nextSeq + 1 else nextSeq
        val expOff = if (expPad > 0) 0L else nextOff
        assert(pad == expPad, s"doc $id: pad_before $pad != $expPad")
        assert(first == expSeq, s"doc $id: seq_first $first != $expSeq")
        assert(off == expOff, s"doc $id: seq_offset $off != $expOff")
        assert(last == expSeq + (expOff + n - 1) / budget, s"doc $id: seq_last")
        // boundary isolation: a doc only straddles when it CANNOT fit
        assert(off == 0L || off + n <= budget,
          s"doc $id: avoidable straddle (off $off + n $n > $budget)")
        if (n <= budget) assert(first == last, s"doc $id: short doc split")
        val endOff = (expOff + n) % budget
        nextSeq = if (endOff == 0) last + 1 else last
        nextOff = endOff
      }
    }

  test("corpus: padded invariants hold, pads occur, layout is deterministic") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.packSequencesPadded(docs, "doc_id", "text",
      TextOps.NumShards, B).as[Row8].collect().toSeq
    assert(out.length == docs.count(), "every doc lands exactly once")
    assertPaddedLayout(out, B)
    assert(out.exists(_._8 > 0), "corpus must exercise the pad branch")
    val again = TextAnalysis.packSequencesPadded(docs, "doc_id", "text",
      TextOps.NumShards, B).as[Row8].collect().toSeq
    assert(out.sortBy(_._1) == again.sortBy(_._1), "rerun == run")
  }

  test("planted straddler: a doc longer than the budget spans ceil(n/B) sequences from offset 0") {
    val budget = 8
    // one shard so the arrival order is fully determined by the hashes;
    // the long doc (17 tokens) must start a sequence and span 3
    val docs = Seq(
      (1L, Seq.fill(5)("a").mkString(" ")),
      (2L, Seq.fill(17)("b").mkString(" ")),
      (3L, Seq.fill(2)("c").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.packSequencesPadded(docs, "doc_id", "text", 1, budget)
      .as[Row8].collect().toSeq
    assertPaddedLayout(out, budget.toLong)
    val long = out.find(_._1 == 2L).get
    assert(long._7 == 0L, "straddler starts at offset 0")
    assert(long._6 - long._5 == 2L, "17 tokens over budget 8 spans 3 sequences")
  }

  test("pack_stats_padded: capacity accounting closes against the layout") {
    import org.apache.spark.sql.functions._
    val stats = TextOps.packStatsPadded(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(stats.length == TextOps.NumShards)
    stats.foreach { case (shard, nDocs, nSeqs, nTok, pad, fill) =>
      assert(nDocs > 0 && nSeqs > 0 && nTok > 0, s"shard $shard empty")
      // tokens + interior pad + tail slack = capacity, so tokens + pad
      // can never exceed it, and fill is exactly tokens/capacity
      assert(nTok + pad <= nSeqs * B,
        s"shard $shard over capacity: $nTok + $pad > ${nSeqs * B}")
      assert(fill ==
        BigDecimal(nTok.toDouble / (nSeqs * B).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"shard $shard fill mismatch")
      // the layout can't waste a whole trailing sequence: the last
      // sequence holds at least one token
      assert(nTok + pad > (nSeqs - 1) * B,
        s"shard $shard has an all-pad trailing sequence")
    }
    // cross-check doc/token mass against the layout rows themselves
    val layout = TextOps.packSequencesPadded(spark, sf)
    val fromLayout = layout.groupBy(col("shard"))
      .agg(count(lit(1)).as("d"), sum(col("n_tokens")).as("t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    stats.foreach { case (shard, nDocs, _, nTok, _, _) =>
      assert(fromLayout(shard) == ((nDocs, nTok)), s"shard $shard mass drift")
    }
  }

  test("plan: the fold adds no exchange — one shard shuffle, one sort") {
    val p = TextAnalysis.packSequencesPadded(Tables.documents(spark, sf),
      "doc_id", "text", TextOps.NumShards, B)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"exactly one shuffle (on shard), got $exchanges:\n$p")
    val sorts = "\\bSort \\[".r.findAllIn(p).size
    assert(sorts == 1, s"window + fold must share one sort, got $sorts:\n$p")
  }
}
