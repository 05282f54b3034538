package graft.operators

import graft.{SparkSpec, Tables}
import graft.packs.TextOps

/** Training-output layout: deterministic sharding and concat-and-chunk
  * sequence packing — per-shard contiguity/continuity invariants, and
  * the one-exchange fused-window plan. */
class ShardPackSpec extends SparkSpec {
  import spark.implicits._

  private val B = TextOps.PackBudget

  test("pack invariants: contiguous positions, seam-exact sequence boundaries, full coverage") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.packSequences(docs, "doc_id", "text",
        TextOps.NumShards, B)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == docs.count(), "every doc lands exactly once")
    assert(out.forall(r => r._2 >= 0 && r._2 < TextOps.NumShards))
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val inOrder = rows.sortBy(_._3)
      assert(inOrder.map(_._3).toSeq == (1L to rows.length).toSeq,
        s"shard $shard: positions must be 1..n contiguous")
      var cum = 0L
      inOrder.foreach { case (id, _, _, n, first, last, off) =>
        assert(n >= 1, s"doc $id: tokens >= 1 by construction")
        // the seam: this doc starts exactly where the previous ended
        assert(off == cum % B, s"doc $id: offset ${off} != ${cum % B}")
        assert(first == cum / B, s"doc $id: seq_first")
        assert(last == (cum + n - 1) / B, s"doc $id: seq_last")
        cum += n
      }
      // chunking covers the shard's whole token stream: the last doc
      // ends in the final sequence
      assert(inOrder.last._6 == (cum - 1) / B)
    }
    // rerun == run (pure function of ids/text)
    val again = TextAnalysis.packSequences(docs, "doc_id", "text",
      TextOps.NumShards, B).as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("plan: one shard exchange, rank+prefix-sum fused into one window sort") {
    val p = TextAnalysis.packSequences(Tables.documents(spark, sf),
      "doc_id", "text", TextOps.NumShards, B)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"exactly one shuffle (on shard), got $exchanges:\n$p")
    val sorts = "\\bSort \\[".r.findAllIn(p).size
    assert(sorts == 1, s"both windows must share one sort, got $sorts:\n$p")
  }

  test("sql twin: identical rows and the same one-exchange one-sort plan") {
    val sql = graft.packs.SqlSurfaceOps.packSequencesSql(spark, sf)
    val df = TextAnalysis.packSequences(Tables.documents(spark, sf),
      "doc_id", "text", TextOps.NumShards, B)
    val t7 = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(sql.collect().map(t7).sortBy(_._1).toSeq ==
      df.collect().map(t7).sortBy(_._1).toSeq,
      "SQL text and DataFrame operator must agree row-for-row")
    // a fresh (unexecuted) instance: post-collect the AQE plan string
    // repeats the exchange in its Initial/Final sections
    val p = graft.packs.SqlSurfaceOps.packSequencesSql(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1 &&
      "\\bSort \\[".r.findAllIn(p).size == 1,
      s"the SQL text must plan exactly like the DataFrame twin:\n$p")
  }
}
