package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout ([[TextAnalysis.zOrder16]] / [[TextAnalysis
  * .layoutZorder]]): Morton interleave correctness against a bit-level
  * reference, the per-shard two-dimension locality bound, and the
  * shuffle-free plan. Cross-engine value parity runs at the driver
  * gate (layout_zorder vs the DuckDB arithmetic oracle). */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(a: Long, b: Long): Long =
    (0 until 16).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("interleave matches the bit-level reference on corners and randoms") {
    val cases = Seq(
      (0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (43690L, 21845L), (10000L, 99L), (12345L, 54321L))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        TextAnalysis.zOrder16(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == refZ(a, b), s"z($a, $b) = $z, want ${refZ(a, b)}")
    }
    // full-domain corner: all 32 bits set
    assert(refZ(65535L, 65535L) == 0xFFFFFFFFL)
  }

  test("z-order is monotone in each dim with the other fixed (prefix locality)") {
    (0L until 64L).foreach { a =>
      assert(refZ(a, 7L) < refZ(a + 1, 7L))
      assert(refZ(7L, a) < refZ(7L, a + 1))
    }
  }

  test("per-shard locality: each shard bounds BOTH dims to 1/4 of their domain") {
    val out = TextAnalysis.layoutZorder(
      graft.Tables.documents(spark, sf), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, q, n, z, shard) =>
      assert(z == refZ(q, n))
      assert(shard == (z >> 28))
      // shard = (n15, q15, n14, q14): fixing it fixes each dim's top 2 bits
      assert((q >> 14) == (((shard >> 2) & 1) << 1 | (shard & 1)))
      assert((n >> 14) == (((shard >> 3) & 1) << 1 | ((shard >> 1) & 1)))
    }
    out.groupBy(_._5).foreach { case (shard, rows) =>
      val qs = rows.map(_._2); val ns = rows.map(_._3)
      assert(qs.max - qs.min < (1L << 14),
        s"shard $shard: quality spread ${qs.max - qs.min} ≥ 2^14")
      assert(ns.max - ns.min < (1L << 14),
        s"shard $shard: length spread ${ns.max - ns.min} ≥ 2^14")
    }
  }

  test("zorderedShards: every written file bounds BOTH dims (data-skipping locality)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zorder-spec").toString
    graft.sinks.Writers.zorderedShards(
      graft.Tables.documents(spark, sf), "doc_id", "text", dir)
    val back = spark.read.parquet(dir)
      .select(col("q_bp"), col("n_tokens"),
        org.apache.spark.sql.functions.input_file_name().as("f"))
      .as[(Long, Long, String)].collect()
    assert(back.nonEmpty)
    back.groupBy(_._3).foreach { case (f, rows) =>
      val qs = rows.map(_._1); val ns = rows.map(_._2)
      assert(qs.max - qs.min < (1L << 14),
        s"file $f: quality spread ${qs.max - qs.min} — a reader filtering " +
          "a quality range could not skip it")
      assert(ns.max - ns.min < (1L << 14),
        s"file $f: length spread ${ns.max - ns.min}")
    }
    // the layout carries the full document row (text joined back), and
    // shard is a real partition column a reader prunes on
    val pruned = spark.read.parquet(dir).filter(col("shard") === 10L)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(shard"),
      "shard must be a prunable partition column")
  }

  test("plan: the assignment is a pure scan-side projection — no exchange, no window") {
    val p = TextAnalysis.layoutZorder(
      graft.Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Window"),
      s"z-order assignment must not shuffle:\n$p")
    // executedPlan strings mark whole-stage-codegen stages with "*(n)"
    assert(p.contains("*("), s"expected codegen stages:\n$p")
  }
}
