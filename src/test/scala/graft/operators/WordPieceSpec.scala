package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{WordPieceTable, WordPieceTokenIds, WordPieceTokenCount}

/** WordPiece trainer + greedy longest-match application
  * ([[WordPieceTokenizer]] / [[graft.functions.WordPieceTable]]):
  * likelihood-gain merge selection (the criterion that separates it
  * from BPE), continuation-form matching, whole-word UNK, and the
  * closed id space. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood criterion picks the exclusive pair over the merely frequent one") {
    // (a,##b) occurs 10× but both symbols have count 10 → score 0.1;
    // (c,##d) occurs 3× and is exclusive → score 1/3. BPE's raw-count
    // rule would merge ab first; WordPiece must merge cd first.
    val wc = Seq(("ab", 10L), ("cd", 3L))
    val v1 = WordPieceTokenizer.train(wc, numMerges = 1)
    assert(v1.contains("cd") && !v1.contains("ab"),
      s"first merge must be the exclusive pair, got $v1")
    // with budget for both, the frequent pair merges second
    val v2 = WordPieceTokenizer.train(wc, numMerges = 2)
    assert(v2.contains("cd") && v2.contains("ab"))
    // base symbols always present, in their positional forms
    assert(Seq("a", "##b", "c", "##d").forall(v2.contains))
  }

  test("greedy longest-match with continuation forms; positional pieces never cross") {
    // vocab: initial "x" exists, continuation "##x" does NOT — an x in
    // second position is uncoverable and the whole word goes UNK
    val t = new WordPieceTable(Seq("##b", "##bc", "a", "abc", "x").sorted)
    assert(t.tokenizeWord("abc").toSeq == Seq("abc"),
      "longest initial match wins over a + ##bc")
    assert(t.tokenizeWord("abcbc").toSeq == Seq("abc", "##bc"),
      "continuation matching resumes greedily after the initial piece")
    assert(t.tokenizeWord("ab").toSeq == Seq("a", "##b"))
    assert(t.tokenizeWord("x").toSeq == Seq("x"))
    assert(t.tokenizeWord("ax").toSeq == Seq(WordPieceTable.UnkMarker),
      "initial-only piece must not match in continuation position")
    assert(t.tokenizeWord("q").toSeq == Seq(WordPieceTable.UnkMarker),
      "uncovered char -> whole-word UNK, never a partial emission")
  }

  test("ids: sorted display index, UNK and empty sentinels, expression == table") {
    val pieces = Seq("##b", "a", "ab").sorted
    val t = new WordPieceTable(pieces)
    assert(t.tokenId("##b") == pieces.indexOf("##b").toLong)
    assert(t.tokenId("ab") == pieces.indexOf("ab").toLong)
    assert(t.tokenId(WordPieceTable.UnkMarker) == pieces.size.toLong)
    assert(t.tokenId("") == pieces.size.toLong + 1)
    val docs = Seq((1L, "ab a q"), (2L, "")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        WordPieceTokenIds(col("text"), t).as("ids"),
        WordPieceTokenCount(col("text"), t).as("n"))
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // "ab" -> [ab]; "a" -> [a]; "q" -> [UNK]; empty text -> [empty]
    assert(out(1L) == ((Seq(t.tokenId("ab"), t.tokenId("a"), t.unkId), 3L)))
    assert(out(2L) == ((Seq(t.emptyId), 1L)))
  }

  test("tie-break: equal scores resolve to the lexicographically smallest pair") {
    // two pairs with identical (count, symbol counts): score ties;
    // ("ax","##b") vs ("ay","##c") -- wait, construct equal-score pairs
    // directly: words "ab"x4 and "cd"x4 -> both score 4/(4*4); the
    // first merge must be the lexicographically smaller (a, ##b)
    val wc = Seq(("ab", 4L), ("cd", 4L))
    val v = WordPieceTokenizer.train(wc, numMerges = 1)
    assert(v.contains("ab") && !v.contains("cd"), s"got $v")
  }

  test("training is deterministic under input reordering") {
    val wc = Seq(("table", 9L), ("tables", 4L), ("stable", 3L), ("able", 7L))
    val a = WordPieceTokenizer.train(wc, 8)
    val b = WordPieceTokenizer.train(wc.reverse, 8)
    assert(a == b, "word-table order must not change the vocabulary")
  }

  test("injectivity guard: '##'-initial words can never mint the '##' display form") {
    // markdown-header corpus: words starting "##". Ungated training
    // would merge initial "#" with continuation "###" into display
    // "##" — colliding with the UNK sentinel and parsing as a
    // continuation cross-engine. The guard must refuse that merge (and
    // its "##x" descendants) while still merging freely elsewhere.
    val wc = Seq(("##one", 9L), ("##two", 8L), ("see", 7L))
    val v = WordPieceTokenizer.train(wc, numMerges = 12)
    assert(!v.contains(WordPieceTable.UnkMarker),
      s"the UNK sentinel must stay unconstructible: $v")
    // no INITIAL piece may display with the continuation prefix: every
    // "##"-prefixed entry must carry non-empty content (else the
    // (content, cont) embedding the oracle uses cannot represent it)
    assert(v.forall(p => WordPieceTable.contentOf(p).nonEmpty),
      s"empty-content display form trained: $v")
    // the guard only constrains the '#' family — ordinary merges land
    assert(v.contains("see"), s"unrelated merges must proceed: $v")
    // ids stay total and engine-consistent on the planted corpus: the
    // greedy matcher covers every word without touching the UNK id
    val t = new WordPieceTable(v)
    val ids = Seq("##one", "##two", "see").map(t.tokenizeWord)
    assert(ids.forall(_.forall(_ != WordPieceTable.UnkMarker)),
      s"planted words must stay coverable: $ids")
  }
}
