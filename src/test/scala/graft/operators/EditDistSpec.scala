package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Edit-distance-verified near-dups ([[Dedup.editDistancePairs]]):
  * the character-positional precision verifier over the capped SimHash
  * candidate source, ASCII-scoped (Spark counts code points, DuckDB
  * counts bytes — they coincide exactly on printable ASCII, which the
  * operator enforces). Cross-engine value parity runs at the driver
  * gate (dedup_editdistance). */
class EditDistSpec extends SparkSpec {
  import spark.implicits._

  test("a planted small-edit pair is found with exact integer ratio math") {
    // 80 tokens: a 1-char edit flips ~3/78 shingles, keeping the
    // simhash fingerprints within the banding's hamming gate
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val edited = base.replace("tok7 ", "tok7x ") // 1 insertion
    val docs = Seq(
      (1L, base), (2L, edited),
      (3L, (100 to 180).map(i => s"zzz$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), s"got ${got.toSeq}")
    val (_, _, dist, ratioBp) = got.head
    assert(dist == 1L)
    assert(ratioBp == 10000L / edited.length.toLong,
      s"ratio $ratioBp != ${10000L / edited.length}")
  }

  test("non-ASCII documents are out of scope (engines disagree on the unit)") {
    val zh = "中文 " * 30
    val docs = Seq((1L, zh.trim), (2L, (zh + "猫").trim)).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(docs, "doc_id", "text").count() == 0,
      "multibyte docs must not reach the edit-distance verifier")
  }

  test("a heavy rewrite shares simhash buckets but fails the ratio gate") {
    // same token multiset mostly, but > 30% of characters rewritten:
    // craft a pair the candidate stage may emit but the verifier must drop
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (1 to 30).map(i => if (i % 2 == 0) s"w$i" else s"XXXX$i").mkString(" ")
    val out = Dedup.editDistancePairs(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.isEmpty, s"a >30%-rewritten pair must be dropped, got ${out.toSeq}")
  }

  test("runs on the real corpus; every ratio is within the gate") {
    val out = Dedup.editDistancePairs(
      graft.Tables.documents(spark, sf), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (a, b, dist, bp) =>
      assert(a < b && dist >= 0L && bp >= 0L && bp <= Dedup.EditMaxRatioBp)
    }
  }

  test("plan: texts join the bounded candidate set — no cartesian, no all-pairs") {
    val p = Dedup.editDistancePairs(
      graft.Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit-distance verification must stay equi-join:\n$p")
  }
}
