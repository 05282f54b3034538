package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Corpus-trained WordPiece vocabulary (Schuster & Nakajima, ICASSP
  * 2012 — the published likelihood-gain criterion; BERT's tokenizer):
  * the BPE merge loop with ONE change — the best pair maximizes
  * count(ab) / (count(a)·count(b)) instead of raw count(ab), i.e. the
  * pair whose merge most improves a unigram LM's corpus likelihood.
  * Rare-but-exclusive pairs merge early; frequent-but-independent
  * pairs (whose co-occurrence is explained by their own frequencies)
  * merge late. Non-initial symbols carry the `##` continuation marker
  * from the start, so a merged piece is positional by construction.
  * Application is [[graft.functions.WordPieceTokenIds]] /
  * [[graft.functions.WordPieceTokenCount]] (greedy longest-match).
  *
  * Scale shape — the bounded-training contract shared by all three
  * tokenizer lineages ([[BpeTokenizer.trainCached]]): the corpus
  * reduces to its top `maxWords` (word, count) heavy hitters via
  * partial-agg + TakeOrderedAndProject, one deliberately bounded
  * driver collect; the merge loop runs driver-local over that table.
  * The trained artifact is the sorted piece list, shipped inside the
  * apply expression.
  *
  * Determinism (what makes the oracle possible): symbol and pair
  * counts follow the BPE trainer's per-position sum; the score
  * comparison is EXACT — cross-multiplied BigInt rationals, never a
  * floating division — with ties to the lexicographically smallest
  * (a, b); merging is left-to-right non-overlapping; training stops
  * when no pair reaches [[BpeTokenizer.MinPairCount]]. The final
  * artifact is display pieces sorted by string, id = index. */
object WordPieceTokenizer {

  /** The trained artifact: display pieces sorted by string
    * (id = index), plus the corpus's max word length in code points —
    * the generated oracle's walk depth ([[UnigramLmTokenizer.Model]]'s
    * contract, verbatim). */
  final case class Model(pieces: Seq[String], maxWordLen: Int) {
    def table: graft.functions.WordPieceTable =
      new graft.functions.WordPieceTable(pieces)
  }

  private def better(x: ((String, String), (Long, Long, Long)),
      y: ((String, String), (Long, Long, Long))): Boolean = {
    // score(x) > score(y) ⇔ cx·ay·by > cy·ax·bx — exact integers
    val ((xa, xb), (cx, ax, bx)) = x
    val ((ya, yb), (cy, ay, by)) = y
    val lhs = BigInt(cx) * BigInt(ay) * BigInt(by)
    val rhs = BigInt(cy) * BigInt(ax) * BigInt(bx)
    if (lhs != rhs) lhs > rhs
    else if (xa != ya) xa < ya
    else xb < yb
  }

  /** The published training loop, driver-local over the bounded word
    * table. Returns the final vocabulary: every base symbol the corpus
    * produced (initial and `##` forms) plus every merged piece, as
    * sorted display strings. */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[String] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Vector[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      val cps = graft.functions.BpeTable.codePointStrings(w)
      (cps.zipWithIndex.map { case (s, i) =>
        if (i == 0) s else "##" + s
      }, c)
    }.toVector
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach { case (syms, _) => syms.foreach(vocab += _) }
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // symbol totals and adjacent-pair counts, each position weighted
      // by its word's corpus count (the BPE trainer's sum)
      val symCounts = new scala.collection.mutable.HashMap[String, Long]()
      val pairCounts =
        new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + c)
          if (i + 1 < syms.length) {
            val k = (syms(i), syms(i + 1))
            pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      // Display-form injectivity guard: an INITIAL merge whose display
      // would start with "##" (head "#" absorbing a "#"-content
      // continuation — words beginning "##", e.g. markdown headers) is
      // excluded from the candidate set. Such a piece would be
      // UNPARSEABLE: the "##" prefix convention would read it as a
      // continuation (and "##" itself as empty-content — colliding
      // with [[graft.functions.WordPieceTable.UnkMarker]]), so Spark's
      // greedy matcher and the oracle's (content, cont) embedding
      // would disagree on every id downstream. Excluding the seed
      // inductively excludes the whole family ("##"+x, …); other
      // candidate pairs still compete normally.
      val candidates = pairCounts.iterator.collect {
        case (k @ (a, b), c) if c >= BpeTokenizer.MinPairCount &&
            !(!a.startsWith("##") &&
              (a + graft.functions.WordPieceTable.contentOf(b))
                .startsWith("##")) =>
          (k, (c, symCounts(a), symCounts(b)))
      }.toSeq
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.reduceLeft((x, y) => if (better(y, x)) y else x)
        val (a, b) = best._1
        // the continuation marker belongs to the PAIR's head: a keeps
        // its form, b's marker dissolves into the merge
        val merged = a + graft.functions.WordPieceTable.contentOf(b)
        vocab += merged
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += merged; i += 2 // left-to-right non-overlapping
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        rank += 1
      }
    }
    vocab.toSeq.sorted
  }

  // One trained vocabulary per (dataset, maxWords, numMerges) per JVM
  // (the IvfIndex.trainCached contract, same caveats).
  private val trained =
    new ConcurrentHashMap[(String, Int, Int), Model]()

  def trainCached(docs: DataFrame, datasetKey: String, textCol: String,
      maxWords: Int, numMerges: Int): Model =
    trained.computeIfAbsent((datasetKey, maxWords, numMerges), _ => {
      import org.apache.spark.sql.functions.{expr, max}
      val pieces = train(
        BpeTokenizer.wordCounts(docs, textCol, maxWords), numMerges)
      // the oracle's walk depth: the FULL corpus's longest word in code
      // points (the heavy-hitter table may miss a rare long word the
      // greedy walk still has to cover) — UnigramLmTokenizer's scan
      val maxLen = docs
        .select(max(expr(
          s"array_max(transform(split($textCol, ' '), w -> length(w)))"))
          .as("m"))
        .collect().headOption.flatMap(r =>
          if (r.isNullAt(0)) None else Some(r.getInt(0))).getOrElse(1)
      Model(pieces, math.max(1, maxLen))
    })

  /** The single model trained for (maxWords, numMerges) in this JVM,
    * if unambiguous — the oracle-generation hook
    * ([[BpeTokenizer.trainedSnapshot]] pattern). */
  def trainedSnapshot(maxWords: Int, numMerges: Int): Option[Model] = {
    import scala.jdk.CollectionConverters._
    val distinct = trained.asScala.collect {
      case ((_, mw, nm), v) if mw == maxWords && nm == numMerges => v
    }.toSeq.distinct
    if (distinct.size == 1) Some(distinct.head) else None
  }
}
