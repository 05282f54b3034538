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

  test("thresholded verification == full-DP reference (r18 banded levenshtein)") {
    import org.apache.spark.sql.functions.{expr, greatest, length, lit}
    // real corpus + a planted near-dup pair (guaranteed ≥1 surviving
    // candidate) — the thresholded form must emit EXACTLY the rows the
    // unthresholded full-DP form emits, distances included
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .union(Seq((900001L, base), (900002L, base.replace("tok7 ", "tok7y ")))
        .toDF("doc_id", "text"))
    val got = Dedup.editDistancePairs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ascii = docs.filter(col("text").rlike("^[ -~]*$"))
    val cands = Dedup.simhashMd5Pairs(ascii, "doc_id", "text")
      .select(col("doc_a"), col("doc_b"))
    val ref = cands
      .join(ascii.select(col("doc_id").as("doc_a"), col("text").as("text_a")), Seq("doc_a"))
      .join(ascii.select(col("doc_id").as("doc_b"), col("text").as("text_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("levenshtein(text_a, text_b)").cast("long").as("edit_dist"),
        greatest(length(col("text_a")), length(col("text_b")), lit(1))
          .cast("long").as("max_len"))
      .withColumn("edit_ratio_bp", expr("edit_dist * 10000 div max_len"))
      .filter(col("edit_ratio_bp") <= Dedup.EditMaxRatioBp)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"), col("edit_ratio_bp"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.nonEmpty && got == ref,
      s"thresholded=${got.size} rows, reference=${ref.size} rows; diff=" +
        s"${(got diff ref) ++ (ref diff got)}")
  }

  test("plan: texts join the bounded candidate set — no cartesian, no all-pairs") {
    val p = Dedup.editDistancePairs(
      graft.Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit-distance verification must stay equi-join:\n$p")
  }
}
