package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{BpeTable, BpeTokenCount, BpeTokens}

/** Corpus-trained BPE: the published training algorithm on the classic
  * textbook corpus, the greedy apply semantics (incl. the boundary
  * cases the marker encoding exists for), expression ≡ driver-side
  * reference fold, and the whitespace-vs-BPE budget drift the
  * denominated twins exist to expose. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training follows the published algorithm on the textbook corpus") {
    // Sennrich's canonical example family: 'low' x5, 'lower' x2,
    // 'newest' x6, 'widest' x3. Highest pair is (e,s) 9 = newest+widest,
    // then (es,t) 9, then (lo,w)... hand-checkable first merges.
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTokenizer.train(wc, numMerges = 4)
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")),
      s"first merges must be the (e,s),(es,t) of the textbook run, got $merges")
    // 'lo' appears in low+lower = 7 times; after (e,s),(es,t) the next
    // best is (l,o) 7 then (lo,w) 7 — count ties broken lexicographically
    assert(merges(2) == (("l", "o")) && merges(3) == (("lo", "w")),
      s"got $merges")
  }

  test("training stops when no pair repeats") {
    assert(BpeTokenizer.train(Seq(("abc", 1L)), 10).isEmpty,
      "every pair occurs once — nothing to merge")
    assert(BpeTokenizer.train(Seq(("aa", 5L)), 10) == Seq(("a", "a")))
  }

  test("apply: greedy left-to-right semantics and boundary exactness") {
    val t = new BpeTable(Seq(("a", "a")))
    assert(t.tokenizeWord("aaa").toSeq == Seq("aa", "a"))
    assert(t.tokenizeWord("aaaa").toSeq == Seq("aa", "aa"))
    assert(t.tokenizeWord("aaaaa").toSeq == Seq("aa", "aa", "a"))
    // boundary exactness: with merges (a,b),(c,d),(b,c) the word 'abcd'
    // becomes [ab, cd] after ranks 1-2; rank 3's pair (b,c) must NOT
    // fire across the [ab][cd] token boundary (the naive single-
    // separator encoding would corrupt exactly this case)
    val t2 = new BpeTable(Seq(("a", "b"), ("c", "d"), ("b", "c")))
    assert(t2.tokenizeWord("abcd").toSeq == Seq("ab", "cd"))
    // but a genuine adjacent (b,c) pair still merges
    assert(t2.tokenizeWord("bc").toSeq == Seq("bc"))
    // empty word = one empty token (the whitespace-split convention)
    assert(t2.tokenizeWord("").toSeq == Seq(""))
    // later merges consume earlier merges' tokens
    val t3 = new BpeTable(Seq(("l", "o"), ("lo", "w")))
    assert(t3.tokenizeWord("lower").toSeq == Seq("low", "e", "r"))
  }

  test("expression equals the driver-side fold over the corpus; count = |tokens|") {
    val docs = Tables.documents(spark, sf)
    val merges = BpeTokenizer.trainCached(docs, sf, "text",
      graft.packs.TextOps.MaxBpeWords, graft.packs.TextOps.NumBpeMerges)
    assert(merges.nonEmpty)
    val table = new BpeTable(merges)
    val got = docs.select(col("doc_id"), col("text"),
        BpeTokens(col("text"), merges).as("toks"),
        BpeTokenCount(col("text"), merges).as("n"))
      .as[(Long, String, Seq[String], Long)].collect()
    got.foreach { case (id, text, toks, n) =>
      val expect = text.split(" ", -1).toSeq.flatMap(table.tokenizeWord(_).toSeq)
      assert(toks == expect, s"doc $id: expression != reference fold")
      assert(n == toks.size, s"doc $id: count != |tokens|")
      // reassembling the word's tokens must reproduce the word (BPE
      // merges never drop or reorder characters)
      assert(toks.mkString("") == text.split(" ", -1).mkString(""),
        s"doc $id: tokens must concatenate back to the text's words")
    }
  }

  test("whitespace-vs-BPE budget drift: the denomination changes real layouts") {
    val docs = Tables.documents(spark, sf)
    val merges = BpeTokenizer.trainCached(docs, sf, "text",
      graft.packs.TextOps.MaxBpeWords, graft.packs.TextOps.NumBpeMerges)
    val counts = docs.select(
        size(TextAnalysis.tokens(col("text"))).cast("long").as("ws"),
        BpeTokenCount(col("text"), merges).as("bpe"))
      .as[(Long, Long)].collect()
    // BPE can only split words further: per-doc bpe >= ws, and the
    // corpus must contain genuine subword splits (strict >) — if every
    // word collapsed to one token the denomination is degenerate and
    // the twins prove nothing
    counts.foreach { case (ws, bpe) =>
      assert(bpe >= ws, s"a word cannot tokenize to fewer than 1 token") }
    assert(counts.exists { case (ws, bpe) => bpe > ws },
      "corpus must exercise genuine subword structure under the trained table")
    val wsTot = counts.map(_._1).sum
    val bpeTot = counts.map(_._2).sum
    info(s"corpus tokens: ws=$wsTot bpe=$bpeTot (x${bpeTot.toDouble / wsTot})")
    // and the drift moves an actual layout: the packed sequence count
    // differs between denominations for the same budget
    val wsSeqs = TextAnalysis.packSequences(docs, "doc_id", "text",
        graft.packs.TextOps.NumShards, graft.packs.TextOps.PackBudget)
      .agg(max(col("seq_last"))).head().getLong(0)
    val bpeSeqs = TextAnalysis.packSequencesWith(docs, "doc_id", "text",
        graft.packs.TextOps.NumShards, graft.packs.TextOps.PackBudget,
        t => BpeTokenCount(t, merges))
      .agg(max(col("seq_last"))).head().getLong(0)
    assert(bpeSeqs > wsSeqs,
      s"BPE-denominated packing must cut more sequences (ws=$wsSeqs bpe=$bpeSeqs)")
  }

  test("truncateWords: word-boundary cap under the subword budget") {
    val t = new BpeTable(Seq(("a", "a")))
    def cut(text: String, max: Long): String =
      t.truncateWords(org.apache.spark.unsafe.types.UTF8String
        .fromString(text), max).toString
    // "aaaa"→2 tokens, "aa"→1, "a"→1
    assert(cut("aaaa aa a", 4) == "aaaa aa a")   // total 4 fits exactly
    assert(cut("aaaa aa a", 3) == "aaaa aa")     // third word would overflow
    assert(cut("aaaa aa a", 2) == "aaaa")
    assert(cut("aaaa aa a", 1) == "")            // first word alone overflows
    assert(cut("", 5) == "")                      // empty text: 1 empty token
    // greedy prefix: a later small word never back-fills past an overflow
    assert(cut("aaaa a aaaa a", 3) == "aaaa a")
  }

  test("determinism: retraining yields the identical merge table") {
    val docs = Tables.documents(spark, sf)
    val wc = BpeTokenizer.wordCounts(docs, "text", 512)
    assert(BpeTokenizer.train(wc, 32) == BpeTokenizer.train(wc, 32))
    assert(BpeTokenizer.wordCounts(docs.repartition(7), "text", 512) == wc,
      "the heavy-hitter draw must be partitioning-independent")
  }

  test("fertility: >= 1 per language, group sums re-add to the corpus") {
    val f = graft.packs.TextOps.bpeFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(f.nonEmpty)
    // every word is at least one token, so fertility is bounded below
    // by 1 — and bounded above by the per-word codepoint count, so a
    // sane corpus sits well under 20
    f.foreach { case (lang, n, words, toks, fert) =>
      assert(n > 0 && words > 0)
      assert(fert >= 1.0 && fert < 20.0, s"$lang fertility $fert")
      // the emitted value is round(·, 4) of the exact ratio
      assert(math.abs(fert - toks.toDouble / words) <= 5e-5)
    }
    val docs = Tables.documents(spark, sf)
    val total = docs.select(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.size(TextAnalysis.tokens(
        org.apache.spark.sql.functions.col("text"))).cast("long")))
      .as[Long].head()
    assert(f.map(_._3).sum == total, "per-language word sums cover the corpus")
  }

  test("vocab curve: tokens/word non-increasing in merge budget, full budget = fertility base") {
    val c = graft.packs.TextOps.bpeVocabCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(c.map(_._1).toSeq ==
      graft.packs.TextOps.BpeCurveBudgets.map(_.toLong))
    // one word total at every budget (same scan, same denominator)
    assert(c.map(_._2).distinct.size == 1)
    // more merges can only merge more adjacent pairs: token mass and
    // fertility are non-increasing along the curve, strictly somewhere
    // (48 trained merges cannot all be no-ops on their own train set)
    c.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"token mass must not grow: $a -> $b")
      assert(b._4 <= a._4, s"fertility must not grow: $a -> $b")
    }
    assert(c.last._3 < c.head._3, "the full budget must beat the smallest")
    // the full-budget point is exactly the corpus the fertility query
    // measures: same trained table, same denomination
    val full = graft.packs.TextOps.bpeFertility(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_tokens_bpe"))
      .as[Long].head()
    assert(c.last._3 == full, "curve endpoint == bpe_fertility total")
  }
}
