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
}
