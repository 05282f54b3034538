package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{BpeByteTable, BpeTable, ByteLevel}

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

  // ---- byte-level base alphabet (GPT-2 lineage) ------------------

  // trained through the production byte path: the same words, merges
  // now over mapped byte symbols
  private val byteTable = new BpeByteTable(BpeTokenizer.train(
    Seq(("the", 50L), ("then", 20L), ("than", 10L), ("they", 8L),
      ("thin", 5L), ("tea", 4L)).map { case (w, c) =>
        (ByteLevel.encode(w), c)
      }, numMerges = 8))
  private val byteUntrained = new BpeByteTable(Seq.empty)

  /** Max legal byte-level id: the space is CLOSED at 256 + numMerges
    * regardless of input — the property the codepoint scheme cannot
    * offer (its single-codepoint ids grow with the input alphabet). */
  private val byteMaxId = ByteLevel.IdBase + byteTable.merges.size

  // words over the FULL unicode space including supplementary planes
  // (emoji, CJK extension), NUL, and the fold markers — at the byte
  // level none of these need an opaque/fallback path
  private val genCp: Gen[Int] = Gen.frequency(
    8 -> Gen.choose('a'.toInt, 'z'.toInt),
    2 -> Gen.oneOf('é'.toInt, 'ß'.toInt, '中'.toInt, '文'.toInt),
    2 -> Gen.oneOf(0x1F600, 0x1F680, 0x2070E), // astral: emoji + CJK-C
    1 -> Gen.oneOf(0x0, 0x1E, 0x1F, 0x7F))
  private val genByteWord: Gen[String] =
    Gen.listOf(genCp).map(cps => cps.flatMap(Character.toChars(_)).mkString)

  test("property: byte-level ids are CLOSED (≤ 256+merges) and decode back — any input") {
    check(Prop.forAll(genByteWord) { w =>
      val ids = byteTable.tokenizeWord(w).map(byteTable.tokenId).toSeq
      // zero codepoint-table growth: every id is a byte, the sentinel,
      // or a trained product — even for emoji/CJK/control input
      ids.forall(id => id >= 0 && id <= byteMaxId) &&
        byteTable.decodeWord(ids) == w
    })
  }

  test("property: untrained byte table emits exactly the UTF-8 bytes") {
    check(Prop.forAll(genByteWord) { w =>
      val toks = byteUntrained.tokenizeWord(w)
      val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (w.isEmpty) toks.sameElements(Array(""))
      else toks.length == bytes.length &&
        toks.zip(bytes).forall { case (t, b) =>
          t.codePointCount(0, t.length) == 1 &&
            ByteLevel.byteOf(t.codePointAt(0)) == (b & 0xFF)
        }
    })
  }

  test("byte level has NO opaque path: fold markers are just bytes") {
    // 0x1E/0x1F map above U+0100 in the bijection, so no input can
    // inject the markers — the codepoint scheme's -1 opaque token and
    // its budget quirk don't exist here
    val w = s"ab${BpeTable.Open}cd${BpeTable.Close}"
    val ids = byteTable.tokenizeWord(w).map(byteTable.tokenId).toSeq
    assert(ids.forall(id => id >= 0 && id <= byteMaxId))
    assert(byteTable.decodeWord(ids) == w)
  }

  test("byte-level trained merges still fire (the 'the' chain)") {
    // 'the' is pure ASCII: its mapped symbols are the letters
    // themselves, so the byte-trained table merges it like the
    // codepoint table does — subword behavior is preserved, only the
    // base alphabet changed
    val toks = byteTable.tokenizeWord("the")
    assert(toks.length < 3, s"trained merges must fire: ${toks.toSeq}")
    val ids = toks.map(byteTable.tokenId)
    assert(ids.exists(_ > ByteLevel.IdBase), "a product id must appear")
    // an emoji word degrades to its 4 UTF-8 bytes, ids all < 256
    val emoji = byteUntrained.tokenizeWord("😀")
    assert(emoji.length == 4)
    assert(emoji.map(byteUntrained.tokenId).forall(id => id >= 0 && id < 256))
  }

  test("ByteLevel bijection: 256 distinct chars, printable bytes map to themselves") {
    val cps = (0 until 256).map(ByteLevel.charOf)
    assert(cps.distinct.size == 256)
    (0 until 256).foreach { b =>
      assert(ByteLevel.byteOf(ByteLevel.charOf(b)) == b)
      val printable = (b >= 0x21 && b <= 0x7E) || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (printable) assert(ByteLevel.charOf(b) == b)
      else assert(ByteLevel.charOf(b) >= 0x100)
    }
  }
}
