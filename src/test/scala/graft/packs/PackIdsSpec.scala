package graft.packs

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Physical-layout invariants of the materialized id shards
  * ([[TextOps.packIdsBpe]]) — what a training READER depends on, over
  * and above the cross-engine hash gate: slots are unique and dense,
  * sequences are budget-bounded, and the stream covers every token
  * exactly once. */
class PackIdsSpec extends SparkSpec {
  import spark.implicits._

  test("pack_ids_bpe: unique dense budget-bounded slots covering every token once") {
    val B = TextOps.PackBudget.toLong
    val out = TextOps.packIdsBpe(spark, sf)
      .select("shard", "seq_id", "seq_pos", "token_id")
      .as[(Long, Long, Long, Long)].collect()

    // coverage: one row per token of the corpus (the count expression
    // and the id expression must agree document by document)
    val m = TextOps.bpeMerges(spark, sf)
    val totalTokens = Tables.documents(spark, sf)
      .select(graft.functions.BpeTokenCount(col("text"), m).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(out.length.toLong == totalTokens,
      s"emitted ${out.length} slots for $totalTokens tokens")

    // slots unique and within budget
    assert(out.map(r => (r._1, r._2, r._3)).distinct.length == out.length,
      "two tokens may never share a physical slot")
    assert(out.forall(r => r._3 >= 0 && r._3 < B), "seq_pos within budget")
    assert(out.forall(_._4 >= 0L), "real corpora never hit the opaque id")

    // density: within each shard every sequence except the last is
    // FULL, and occupied positions are contiguous from 0 — the
    // concat-and-chunk contract (a reader may mmap fixed-size rows)
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val bySeq = rows.groupBy(_._2)
      val last = bySeq.keys.max
      bySeq.foreach { case (seq, slots) =>
        val ps = slots.map(_._3).sorted
        assert(ps.head == 0L && ps.last == ps.length - 1L,
          s"shard $shard seq $seq: positions not contiguous from 0")
        if (seq != last)
          assert(slots.length.toLong == B,
            s"shard $shard seq $seq: interior sequence not full " +
              s"(${slots.length} of $B)")
      }
    }
  }

  test("pack_ids_incremental_store ≡ one-shot modulo placement; slots stay dense") {
    val B = TextOps.PackBudget.toLong
    val inc = TextOps.packIdsIncrementalStore(spark, sf)
      .select("doc_id", "shard", "seq_id", "seq_pos", "token_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val one = TextOps.packIdsBpe(spark, sf)
      .select("doc_id", "shard", "seq_id", "seq_pos", "token_id")
      .as[(Long, Long, Long, Long, Long)].collect()

    // per-doc CONTENT is placement-independent: same shard (a pure id
    // hash), same token-id sequence in stream order — only the physical
    // (seq_id, seq_pos) slots may differ (arrival-major vs all-corpus
    // hash order)
    def contentOf(rows: Array[(Long, Long, Long, Long, Long)]) =
      rows.groupBy(_._1).map { case (d, rs) =>
        d -> (rs.head._2,
          rs.sortBy(r => (r._3, r._4)).map(_._5).toSeq)
      }
    assert(contentOf(inc) == contentOf(one),
      "per-doc shard + ordered token ids must match the one-shot layout")

    // the appended layout keeps the reader contract: unique dense
    // budget-bounded slots, interior sequences full
    assert(inc.map(r => (r._2, r._3, r._4)).distinct.length == inc.length,
      "two tokens may never share a physical slot after an append")
    assert(inc.forall(r => r._4 >= 0 && r._4 < B))
    inc.groupBy(_._2).foreach { case (shard, rows) =>
      val bySeq = rows.groupBy(_._3)
      val last = bySeq.keys.max
      bySeq.foreach { case (seq, slots) =>
        val ps = slots.map(_._4).sorted
        assert(ps.head == 0L && ps.last == ps.length - 1L,
          s"shard $shard seq $seq: positions not contiguous after append")
        if (seq != last) assert(slots.length.toLong == B)
      }
    }

    // APPEND-ONLY: batch 0 docs (doc_id % mod != 0) occupy exactly the
    // prefix of every shard stream — the already-emitted layout was
    // not re-packed (every batch-0 slot index < every batch-1 slot
    // index within a shard)
    val mod = TextOps.TextIncrementalBatchMod
    inc.groupBy(_._2).foreach { case (shard, rows) =>
      val slotOf = (r: (Long, Long, Long, Long, Long)) => r._3 * B + r._4
      val seenMax = rows.filter(_._1 % mod != 0).map(slotOf).maxOption
      val freshMin = rows.filter(_._1 % mod == 0).map(slotOf).minOption
      (seenMax, freshMin) match {
        case (Some(a), Some(b)) =>
          assert(a < b, s"shard $shard: appended tokens must land strictly " +
            s"after the existing stream (seen max $a, fresh min $b)")
        case _ => ()
      }
    }
  }

  test("incremental pack layout: restart adoption + replay re-emit identical rows") {
    import graft.streaming.StreamingPipelines.packIngestBatch
    val m = TextOps.bpeMerges(spark, sf)
    val countOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => graft.functions.BpeTokenCount(t, m)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val seen = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-packids-restart").toString
    val cols = Seq("doc_id", "shard", "pos", "n_tokens", "seq_first",
      "seq_last", "seq_offset")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet

    val store = new graft.streaming.PackStore(
      TextOps.NumShards, TextOps.PackBudget, dir)
    packIngestBatch(store, seen, "doc_id", "text", 0L, countOf)
    val emitted1 = rowsOf(
      packIngestBatch(store, fresh, "doc_id", "text", 1L, countOf))

    // at-least-once REPLAY of the last batch on the same store: its
    // contribution is already merged under its id, the strict
    // batch_id < B base read re-derives the original offsets
    val replay = rowsOf(
      packIngestBatch(store, fresh, "doc_id", "text", 1L, countOf))
    assert(replay == emitted1, "same-store replay must re-emit identically")

    // RESTART: a fresh store instance adopting the same directory
    // (crash between sink write and the next trigger) replays the last
    // batch byte-identically — the versioned CAS state is the truth
    val adopted = new graft.streaming.PackStore(
      TextOps.NumShards, TextOps.PackBudget, dir)
    assert(adopted.isReplay(1L), "adoption must see batch 1 as merged")
    val replayAfterRestart = rowsOf(
      packIngestBatch(adopted, fresh, "doc_id", "text", 1L, countOf))
    assert(replayAfterRestart == emitted1,
      "post-restart replay must re-emit identically")

    // parameter pinning: adopting the layout under a different budget
    // must refuse loudly (it would re-chunk already-emitted sequences)
    val e = intercept[IllegalArgumentException](
      new graft.streaming.PackStore(TextOps.NumShards,
        TextOps.PackBudget + 1, dir))
    assert(e.getMessage.contains("layout"))
  }
}
