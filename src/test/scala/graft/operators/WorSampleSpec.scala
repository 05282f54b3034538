package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact weighted sampling without replacement
  * ([[TextAnalysis.weightedSampleWor]]): integer hash-race keys,
  * quality-decile weights, bounded-heap top-k per group. Cross-engine
  * value parity runs at the driver gate (weighted_sample_wor vs the
  * DuckDB window oracle); this suite pins the key construction and the
  * no-window scale shape. */
class WorSampleSpec extends SparkSpec {
  import spark.implicits._

  /** Reference key: max over j in [1, w] of the first 12 md5 hex chars
    * of "id#wor#j" parsed as a long. */
  private def refKey(id: Long, w: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1L to w).map { j =>
      md.reset()
      val hex = md.digest(s"$id#wor#$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }.max
  }

  test("keys match the reference max-of-w-uniforms construction") {
    // weight follows the quality decile: craft docs whose quality is
    // pinned by construction is fiddly — instead read the weights the
    // operator derived and check the KEY for each (id, weight) pair
    val docs = graft.Tables.documents(spark, sf)
    val out = TextAnalysis.weightedSampleWor(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val weights = docs
      .select(col("doc_id"), TextAnalysis.qualityBp(col("text")).as("q_bp"))
      .select(col("doc_id"),
        (least(expr("q_bp div 1000"), lit(9L)) + 1L).as("w"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (_, _, id, key) =>
      assert(key == refKey(id, weights(id)),
        s"doc $id (w=${weights(id)}): key $key != ${refKey(id, weights(id))}")
    }
  }

  test("per-group output is exactly min(k, group size), ranked by key desc") {
    val docs = graft.Tables.documents(spark, sf)
    val sizes = docs.groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    val out = TextAnalysis.weightedSampleWor(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length ==
        math.min(TextAnalysis.WorSampleK.toLong, sizes(src)),
        s"source $src: ${rows.length} rows")
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to rows.length).toSeq)
      // keys non-increasing in rank (ties broken by id would still
      // keep keys equal, which is fine)
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 >= b._4, s"rank order violates key order in $src")
      }
    }
  }

  test("weighting is real: all-max-weight docs beat the unweighted draw on average") {
    // two synthetic groups of the same ids: the operator's keys with
    // w=10 stochastically dominate w=1 — check the aggregate fact that
    // the max-weight key for each id is >= its own single-draw key
    (1L to 50L).foreach { id =>
      assert(refKey(id, 10L) >= refKey(id, 1L),
        "max over a superset of draws can never be smaller")
    }
  }

  test("plan: no ranking window — the top-k is the bounded-heap aggregate") {
    val p = TextAnalysis.weightedSampleWor(
      graft.Tables.documents(spark, sf), "doc_id", "text", "source")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"WOR sampling must not window:\n$p")
    assert(p.contains("graft_topk"),
      s"expected the bounded-heap aggregate in:\n$p")
    assert(p.contains("partial_graft_topk"),
      s"top-k must partially aggregate map-side:\n$p")
  }
}
