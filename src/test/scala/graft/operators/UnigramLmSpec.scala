package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.UnigramTable

/** Unigram-LM tokenizer: Viterbi optimality under the integer-cost
  * tie-break rule, totality over arbitrary input (UNK floor), the
  * closed id space, and trainer determinism. Driver-local. */
class UnigramLmSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val P = UnigramLmTokenizer.MaxPieceLen

  // hand-built table: cheap 'ab', expensive singles — ids follow the
  // sorted-by-string index contract (a=0, ab=1, b=2, c=3)
  private val t = new UnigramTable(Seq(
    ("a", 3000000L), ("ab", 1000000L), ("b", 3000000L), ("c", 2000000L)), P)

  test("one cheap piece beats two singles; splits happen when cheaper") {
    assert(t.tokenizeWord("ab").toSeq == Seq("ab"))
    // "ba": no 'ba' piece — must split
    assert(t.tokenizeWord("ba").toSeq == Seq("b", "a"))
    assert(t.tokenizeWord("abc").toSeq == Seq("ab", "c"))
  }

  test("equal-cost tie breaks to the LONGEST piece (the shared key rule)") {
    // 'xy' costs exactly x+y: key rule must pick the single piece
    val tie = new UnigramTable(Seq(
      ("x", 1000000L), ("xy", 2000000L), ("y", 1000000L)), P)
    assert(tie.tokenizeWord("xy").toSeq == Seq("xy"))
  }

  test("uncovered chars segment as UNK singles; ids stay in the closed space") {
    assert(t.tokenizeWord("aZb").toSeq == Seq("a", "Z", "b"))
    assert(t.tokenId("Z") == t.unkId)
    assert(t.tokenId("") == t.emptyId)
    assert(t.tokenId("ab") == 1L && t.tokenId("c") == 3L)
  }

  test("empty words (doubled/edge spaces) emit the empty sentinel") {
    import org.apache.spark.unsafe.types.UTF8String
    val ids = t.ids(UTF8String.fromString("a  b")).toLongArray().toSeq
    assert(ids == Seq(0L, t.emptyId, 2L))
  }

  // segmentation totality + losslessness over arbitrary input,
  // including astral-plane code points (DuckDB character semantics)
  private val genWord: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("é", "ß", "中", "😀"),
    1 -> Gen.oneOf(".", "-", "'"))).map(_.mkString)

  test("property: pieces concatenate back to the word; every id is in range") {
    check(Prop.forAll(genWord) { w =>
      val pieces = t.tokenizeWord(w)
      val ids = pieces.map(t.tokenId)
      pieces.mkString == w &&
        ids.forall(id => id >= 0L && id <= t.emptyId) &&
        (w.nonEmpty || pieces.toSeq == Seq(""))
    })
  }

  test("trainer: deterministic, totality floor kept, learned pieces used") {
    val wc = Seq(("hello", 60L), ("help", 30L), ("hell", 20L), ("lop", 9L),
      ("pool", 7L), ("loop", 5L))
    val a = UnigramLmTokenizer.train(wc, 16)
    val b = UnigramLmTokenizer.train(wc, 16)
    assert(a == b, "training must be deterministic")
    val pieces = a.map(_._1)
    val singles = Set("h", "e", "l", "o", "p")
    assert(singles.subsetOf(pieces.toSet), s"totality floor missing: $pieces")
    assert(pieces.exists(_.length > 1), s"no multi-char piece learned: $pieces")
    // the trained table actually uses a learned piece on a training word
    val table = new UnigramTable(a, P)
    assert(table.tokenizeWord("hello").length < 5,
      s"Viterbi never used a multi-char piece: " +
        table.tokenizeWord("hello").toSeq)
    assert(pieces == pieces.sorted, "artifact must be sorted by string (ids)")
  }

  test("training is invariant under word-table permutation (the store argument)") {
    val wc = Seq(("hello", 60L), ("help", 30L), ("hell", 20L), ("lop", 9L),
      ("pool", 7L), ("loop", 5L))
    assert(UnigramLmTokenizer.train(wc, 16) ==
      UnigramLmTokenizer.train(wc.reverse, 16),
      "summed counts arriving in any order must train identical pieces")
  }

  test("truncateWords keeps the longest word-prefix within the budget") {
    import org.apache.spark.unsafe.types.UTF8String
    def cut(s: String, n: Long) =
      t.truncateWords(UTF8String.fromString(s), n).toString
    // "ab" = 1 token, "ba" = 2, "c" = 1
    assert(cut("ab ba c", 3L) == "ab ba")
    assert(cut("ab ba c", 4L) == "ab ba c")
    assert(cut("ba", 1L) == "", "a first word over budget yields empty")
  }

  test("LM cost = the Viterbi segmentation's summed piece costs") {
    import org.apache.spark.unsafe.types.UTF8String
    def cost(s: String) = t.totalCostMicro(UTF8String.fromString(s))
    assert(cost("ab") == 1000000L, "the cheap piece's cost, not the singles'")
    assert(cost("ba") == 6000000L)
    assert(cost("a  b") == 6000000L, "empty split artifacts carry no mass")
    assert(cost("Z") == graft.functions.UnigramTable.UnkCostMicro)
    assert(cost("") == 0L)
  }

  test("ids/count agree with the segmentation across whitespace folds") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = "ab ba  cab"
    val want = Seq("ab", "b", "a", "", "c", "ab").map(t.tokenId)
    assert(t.ids(UTF8String.fromString(s)).toLongArray().toSeq == want)
    assert(t.count(UTF8String.fromString(s)) == want.length.toLong)
  }
}
