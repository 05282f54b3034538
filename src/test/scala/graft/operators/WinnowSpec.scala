package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Winnowing fingerprints ([[Dedup.winnowFingerprints]], Schleimer/
  * Wilkerson/Aiken SIGMOD'03) and the MOSS-style shared-fingerprint
  * pairing ([[Dedup.winnowPairs]]). Cross-engine value parity runs at
  * the driver gate (fingerprint_winnow / dedup_winnow vs the DuckDB
  * window+join oracle); this suite pins the algorithm itself against a
  * brute-force reference and the paper's guarantees. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = Dedup.WinnowGramTokens // 4
  private val W = Dedup.WinnowWindow     // 4

  /** Brute-force reference: md5-hex gram per position, every window of
    * W consecutive grams (one whole-doc window when n < W) selects its
    * minimum with RIGHTMOST tie-break; distinct (pos, gram). */
  private def reference(text: String): Set[(Long, String)] = {
    val toks = text.split(" ", -1)
    if (toks.length < K) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (0 to toks.length - K).map { p =>
      val g = toks.slice(p, p + K).mkString(" ")
      md.reset()
      md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val n = grams.length
    val ends = if (n < W) Seq(n - 1) else (W - 1) until n
    ends.map { e =>
      val lo = math.max(0, e - W + 1)
      val win = (lo to e).map(p => (grams(p), p))
      val m = win.map(_._1).min
      val pos = win.filter(_._1 == m).map(_._2).max // rightmost
      (pos.toLong, m)
    }.toSet
  }

  private def winnow(docs: Seq[(Long, String)]): Map[Long, Set[(Long, String)]] =
    Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.map(r => (r._2, r._3)).toSet
      }

  test("matches the brute-force reference on varied docs (incl. ties and short docs)") {
    val docs = Seq(
      1L -> "a b c d e f g h i j k l m n o p q r s t",   // 20 tokens, distinct
      2L -> "x x x x x x x x x x",                       // all grams tie
      3L -> "m1 m2 m3 m4 m5",                            // 2 grams < w: one window
      4L -> "p q r s p q r s p q r s p q r s",           // period-4 repeats
      5L -> "z1 z2 z3 z4",                               // exactly one gram
      6L -> "u1 u2 u3"                                    // sub-k: no grams at all
    )
    val got = winnow(docs)
    docs.foreach { case (id, text) =>
      val want = reference(text)
      assert(got.getOrElse(id, Set.empty) == want,
        s"doc $id: got ${got.getOrElse(id, Set.empty)}, want $want")
    }
  }

  test("every full window of w grams contains a selected position (coverage)") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val sel = winnow(Seq(10L -> text))(10L).map(_._1)
    val nGrams = 40 - K + 1
    ((W - 1) until nGrams).foreach { e =>
      assert(sel.exists(p => p >= e - W + 1 && p <= e),
        s"window ending at $e has no fingerprint (selected: $sel)")
    }
  }

  test("rightmost tie-break: a constant doc selects each window's last position") {
    val sel = winnow(Seq(7L -> "x x x x x x x x x x"))(7L).map(_._1)
    // 7 grams (pos 0..6), all identical: each window [e-3, e] selects e
    assert(sel == Set(3L, 4L, 5L, 6L), s"got $sel")
  }

  test("guarantee threshold: a shared k+w-1-token run shares a fingerprint; sub-k does not") {
    val run7 = "r1 r2 r3 r4 r5 r6 r7" // t = k + w - 1 = 7
    val a = s"a1 a2 a3 a4 a5 a6 a7 a8 $run7 a9 a10 a11 a12"
    val b = s"$run7 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val fp = winnow(Seq(1L -> a, 2L -> b))
    val shared = fp(1L).map(_._2) intersect fp(2L).map(_._2)
    assert(shared.nonEmpty, "a 7-token shared run must share a fingerprint")

    val sub = "s1 s2 s3" // < k tokens: no shared gram can exist
    val c = s"c1 c2 c3 c4 c5 $sub c6 c7 c8"
    val d = s"d1 d2 $sub d3 d4 d5 d6 d7 d8"
    val fp2 = winnow(Seq(3L -> c, 4L -> d))
    assert((fp2(3L).map(_._2) intersect fp2(4L).map(_._2)).isEmpty,
      "a sub-k shared run must be invisible")
  }

  test("winnowPairs finds a planted long-overlap pair and respects the hot cap") {
    val run = (1 to 30).map(i => s"sh$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 a2 a3 a4 a5 $run a6 a7",
      2L -> s"$run b1 b2 b3 b4 b5 b6 b7 b8",
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", K, W)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)),
      s"expected exactly the planted pair, got $pairs")
    assert(pairs.head._3 >= Dedup.WinnowMinShared)

    // hot cap: a fingerprint shared by > maxDocsPerGram docs generates
    // no pairs — with cap 2, three docs of identical text pair ZERO
    // times (every shared hash is hot)
    val same = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    val hotDocs = Seq(1L -> same, 2L -> same, 3L -> same).toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(hotDocs, "doc_id", "text", K, W,
      minShared = 1, maxDocsPerGram = 2)
    assert(capped.count() == 0, "hot fingerprints must be capped out")
  }

  test("xxhash64 production twin: same planted pair, same guarantees, own sketch") {
    // the two hash families order grams differently and so select
    // DIFFERENT (equally valid) winnowing sketches — the value gate is
    // the planted long-overlap pair plus the coverage guarantee, the
    // same discipline as the minhash/simhash xxh64 twins
    val run = (1 to 30).map(i => s"xh$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 a2 a3 $run a4",
      2L -> s"$run b1 b2 b3 b4",
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairsXxh64(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"xxh64 twin must find the planted pair, got ${pairs.toSeq}")
    // coverage holds for the long-hash sketch too: every full window
    // of w grams in a real doc contains a selected position
    val text = (1 to 40).map(i => s"xt$i").mkString(" ")
    val sel = Dedup.winnowFingerprintsXxh64(
      Seq(10L -> text).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(_._2).toSet
    val nGrams = 40 - K + 1
    ((W - 1) until nGrams).foreach { e =>
      assert(sel.exists(p => p >= e - W + 1 && p <= e),
        s"window ending at $e has no xxh64 fingerprint")
    }
  }

  test("incremental probe == full-corpus pairs restricted to the batch (real corpus)") {
    val docs = graft.Tables.documents(spark, sf)
    val mod = graft.packs.DedupOps.IncrementalBatchMod
    val full = Dedup.winnowPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val restricted = full.filter(p => p._1 % mod == 0 || p._2 % mod == 0)
    val inc = Dedup.incrementalWinnowPairs(
      docs.filter(col("doc_id") % mod === 0),
      docs.filter(col("doc_id") % mod =!= 0), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(inc == restricted, s"inc ${inc.size} != restricted ${restricted.size}")
  }

  test("store probe == recompute probe; excludeBatchIds makes replays exact") {
    val docs = graft.Tables.documents(spark, sf)
    val mod = graft.packs.DedupOps.IncrementalBatchMod
    val batch = docs.filter(col("doc_id") % mod === 0)
    val seen = docs.filter(col("doc_id") % mod =!= 0)
    val store = new WinnowStore(s"graft_winnow_spec_${System.nanoTime()}")
    store.ingest(seen, "doc_id", "text", batchId = 1L)
    val fromStore = store.probe(batch, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val recompute = Dedup.incrementalWinnowPairs(batch, seen, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(fromStore == recompute && fromStore.nonEmpty)
    // merge the batch too (the accepted-ingest step), then REPLAY the
    // probe with excludeBatchIds: the batch's own stored fingerprints
    // are anti-joined out, so the replay returns the original pairs
    store.ingest(batch, "doc_id", "text", batchId = 2L)
    val replay = store.probe(batch, "doc_id", "text", excludeBatchIds = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(replay == fromStore, "replay with excludeBatchIds must be exact")
  }

  test("plan: pairing is equi-join only and window state is per-document") {
    val p = Dedup.winnowPairs(
      graft.Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"winnow pairing must stay equi-join:\n$p")
    // every window in the fingerprint selection must be doc-partitioned
    // — a global or hash-keyed window would funnel corpus-sized
    // partitions into single tasks (checked on winnowFingerprints'
    // own plan: winnowPairs checkpoints the fingerprint table, which
    // hides the upstream stages from its executedPlan)
    val fpPlan = Dedup.winnowFingerprints(
      graft.Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([a-zA-Z_0-9#]+)"
      .r.findAllMatchIn(fpPlan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("doc_id")),
      s"windows must partition by doc_id, got $specs in:\n$fpPlan")
    // the bounded-frame selection is ONE per-doc window pass: a single
    // exchange, no join, no distinct — the shape the 2(w−1)-frame
    // rewrite exists for
    assert("Exchange".r.findAllIn(fpPlan).length == 1,
      s"fingerprint selection must cost exactly one exchange:\n$fpPlan")
    assert(!fpPlan.contains("Join") && !fpPlan.contains("HashAggregate"),
      s"fingerprint selection must be join- and agg-free:\n$fpPlan")
  }
}
