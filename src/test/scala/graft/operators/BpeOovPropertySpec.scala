package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.BpeTable

/** BPE behavior OFF the training distribution (VERDICT r10 item 4):
  * the codepoint-level tokenizer has NO UNK path — an out-of-vocabulary
  * word (even one whose codepoint pairs never appeared in training)
  * degrades to finer tokens, never to loss. The properties here are
  * what GPT-2's byte-level fallback exists to guarantee at the byte
  * level; at the codepoint level this tokenizer already satisfies
  * them, so no fallback variant is needed — these specs pin that.
  * Driver-local (no Spark jobs), so sample counts can be large. */
class BpeOovPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // a trained table whose merges chain (t+h, th+e) — built by the
  // production trainer so ranks/ties follow the published algorithm
  private val table = new BpeTable(BpeTokenizer.train(
    Seq(("the", 50L), ("then", 20L), ("than", 10L), ("they", 8L),
      ("thin", 5L), ("tea", 4L)), numMerges = 8))
  private val untrained = new BpeTable(Seq.empty)

  // word characters: ASCII letters/digits/punct, some multi-byte BMP
  // chars, and the internal BEGIN/END markers (the opaque-token
  // collision path must hold the invariants too)
  private val genChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('.', '-', '\'', '#', '!'),
    2 -> Gen.oneOf('é', 'ß', 'λ', '中', '文'),
    1 -> Gen.oneOf(BpeTable.Open, BpeTable.Close))
  private val genWord: Gen[String] = Gen.listOf(genChar).map(_.mkString)

  private def codepoints(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  test("property: any word tokenizes LOSSLESSLY (concat == word)") {
    check(Prop.forAll(genWord) { w =>
      table.tokenizeWord(w).mkString == w &&
        untrained.tokenizeWord(w).mkString == w
    })
  }

  test("property: token count in [1, codepoints]; merges never inflate") {
    check(Prop.forAll(genWord) { w =>
      val n = table.tokenizeWord(w).length
      val n0 = untrained.tokenizeWord(w).length
      val cps = codepoints(w).size
      val hasMarker =
        w.indexOf(BpeTable.Open) >= 0 || w.indexOf(BpeTable.Close) >= 0
      // empty word = one empty token; marker words collapse to one
      // opaque token; otherwise untrained = exactly the codepoints and
      // the trained table can only merge, never split
      (if (w.isEmpty || hasMarker) n == 1 && n0 == 1
       else n0 == cps && n >= 1 && n <= cps && n <= n0)
    })
  }

  test("property: every token is a merge-closure vocab entry or a single codepoint") {
    // the no-UNK property: the emitted alphabet is exactly {single
    // codepoints} ∪ {merge products}, plus the whole-word opaque token
    // on marker collision — nothing is ever dropped or substituted
    val vocab = table.merges.map { case (a, b) => a + b }.toSet
    check(Prop.forAll(genWord) { w =>
      val hasMarker =
        w.indexOf(BpeTable.Open) >= 0 || w.indexOf(BpeTable.Close) >= 0
      val toks = table.tokenizeWord(w)
      if (w.isEmpty) toks.sameElements(Array(""))
      else if (hasMarker) toks.sameElements(Array(w))
      else toks.forall(t =>
        vocab.contains(t) || codepoints(t).size == 1)
    })
  }

  test("fully-OOV word: unseen codepoint pairs degrade to per-codepoint tokens") {
    // Cyrillic never appeared in training: no merge applies, every
    // codepoint survives as its own token — count = |codepoints|
    val w = "привет"
    assert(table.tokenizeWord(w).toSeq == codepoints(w))
    // mixed word: the trained prefix still merges, the OOV tail splits
    val mixed = "theпр"
    val toks = table.tokenizeWord(mixed).toSeq
    assert(toks.mkString == mixed)
    assert(toks.contains("the") || toks.contains("th"),
      s"trained prefix must still merge inside an OOV word: $toks")
    assert(toks.takeRight(2) == Seq("п", "р"))
  }

  test("property: token-id sequences decode back to the word (no vocab table)") {
    // the vocabulary-free scheme is INVERTIBLE from the merge table
    // alone: ids below IdBase are code points, ids above are 1-based
    // merge ranks — so a stored id sequence reconstructs its tokens
    // (and hence the word) with nothing but the trained merges
    val products = table.merges.map { case (a, b) => a + b }
    def decode(id: Long): String =
      if (id == BpeTable.EmptyTokenId) ""
      else if (id < BpeTable.IdBase) new String(Character.toChars(id.toInt))
      else products((id - BpeTable.IdBase - 1).toInt)
    // the sentinel is disjoint from a legal NUL codepoint token: a
    // U+0000 word decodes to NUL, an empty split artifact to ""
    assert(table.tokenId("\u0000") == 0L)
    assert(table.tokenId("") == BpeTable.EmptyTokenId)
    assert(decode(table.tokenId("\u0000")) == "\u0000")
    val genClean = genWord.map(_.filterNot(c =>
      c == BpeTable.Open || c == BpeTable.Close))
    check(Prop.forAll(genClean) { w =>
      val ids = table.tokenizeWord(w).map(table.tokenId)
      ids.forall(_ >= 0) && ids.map(decode).mkString == w
    })
  }

  test("the marker-collision opaque path is still budget-consistent") {
    val w = s"ab${BpeTable.Open}cd"
    assert(table.tokenizeWord(w).toSeq == Seq(w))
    // and through the text-level count: one token, text reassembles
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s"$w the")
    assert(table.count(u) ==
      1 + table.tokenizeWord("the").length)
  }
}
