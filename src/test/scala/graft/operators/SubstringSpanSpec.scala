package graft.operators

import graft.SparkSpec

/** Token-level repeated-substring spans ([[Dedup.duplicateSpans]]):
  * duplicated >= k-token runs found anywhere in the corpus (cross-doc
  * AND within-doc), overlapping/adjacent windows merged into MAXIMAL
  * spans, sub-k runs invisible. Cross-engine value parity runs at the
  * driver gate (dedup_substring_spans vs the DuckDB islands oracle). */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  // 10-token run shared verbatim by two docs; every other token is
  // unique corpus-wide so no accidental window repeats
  private val run10 =
    "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"

  private def spans(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", K)
      .as[(Long, Long, Long)].collect().toSet

  test("a cross-doc >= k-token run yields one maximal span per side") {
    val a = s"a1 a2 a3 a4 a5 $run10 a6 a7 a8"   // run at tokens 5..14
    val b = s"$run10 b1 b2 b3 b4 b5 b6 b7 b8"   // run at tokens 0..9
    val got = spans(Seq((1L, a), (2L, b)))
    // windows 5..7 in doc 1 (and 0..2 in doc 2) are duplicated; the
    // island merge must recover the FULL 10-token run, not 8
    assert(got == Set((1L, 5L, 10L), (2L, 0L, 10L)), s"got $got")
  }

  test("within-doc repetition is found; separated repeats stay separate spans") {
    val doc = s"c1 c2 $run10 c3 c4 c5 c6 c7 c8 c9 c10 $run10 c11"
    // occurrences at tokens 2..11 and 20..29; the duplicated windows
    // sit at 2..4 and 20..22 — position gap 16 > k, two islands
    val got = spans(Seq((1L, doc)))
    assert(got == Set((1L, 2L, 10L), (1L, 20L, 10L)), s"got $got")
  }

  test("back-to-back repeats merge into one maximal span (adjacency)") {
    val p = "p1 p2 p3 p4 p5 p6 p7 p8" // exactly k tokens
    val doc1 = s"$p $p d1 d2"          // P twice, adjacent: tokens 0..15
    val doc2 = s"e1 e2 e3 $p e4"       // P once more, elsewhere
    val got = spans(Seq((1L, doc1), (2L, doc2)))
    // doc 1's duplicated windows sit at 0 and 8 (the boundary-spanning
    // windows are unique) — adjacency (gap == k) merges them into ONE
    // 16-token span
    assert(got == Set((1L, 0L, 16L), (2L, 3L, 8L)), s"got $got")
  }

  test("unique corpus and sub-k shared runs produce nothing") {
    val run7 = "t1 t2 t3 t4 t5 t6 t7"
    assert(spans(Seq(
      (1L, s"u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (2L, s"v1 v2 $run7 v3 v4"),
      (3L, s"w1 w2 w3 $run7 w4"))).isEmpty,
      "a 7-token shared run must be invisible at k = 8")
  }

  private def strip(docs: Seq[(Long, String)]): Map[Long, (String, Long)] =
    Dedup.stripDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", K)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("strip removes exactly the duplicated spans, keeps order, counts drops") {
    val a = s"a1 a2 a3 a4 a5 $run10 a6 a7 a8"
    val b = s"$run10 b1 b2 b3 b4 b5 b6 b7 b8"
    val c = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10" // untouched bystander
    val got = strip(Seq((1L, a), (2L, b), (3L, c)))
    assert(got(1L) == (("a1 a2 a3 a4 a5 a6 a7 a8", 10L)), s"got ${got(1L)}")
    assert(got(2L) == (("b1 b2 b3 b4 b5 b6 b7 b8", 10L)), s"got ${got(2L)}")
    assert(got(3L) == ((c, 0L)),
      "a document with no duplicated span must pass through verbatim")
  }

  test("strip of a fully-duplicated document leaves empty text") {
    val got = strip(Seq((1L, run10 + " x1 x2"), (2L, run10)))
    // doc 2 IS the shared run — every token drops
    assert(got(2L) == (("", 10L)), s"got ${got(2L)}")
    assert(got(1L) == (("x1 x2", 10L)), s"got ${got(1L)}")
  }

  test("sf documents: spans exist, all >= k tokens, starts in range") {
    val docs = graft.Tables.documents(spark, sf)
    val got = Dedup.duplicateSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty, "the synthetic corpus contains near-dup docs " +
      "sharing >= 8-token runs — zero spans means the pipeline is broken")
    assert(got.forall(_._3 >= Dedup.DupSpanTokens))
    assert(got.forall(s => s._2 >= 0))
    // spans never overlap within a doc (maximality: islands merged)
    got.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(y._2 > x._2 + x._3,
            s"overlapping/adjacent spans must have merged: $x $y")
        case _ =>
      }
    }
  }
}
