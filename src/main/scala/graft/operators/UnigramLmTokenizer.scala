package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UnigramTable

/** Corpus-trained unigram-language-model tokenizer (Kudo, ACL 2018 —
  * the SentencePiece unigram model): seed a piece inventory from
  * frequent word substrings, iterate hard (Viterbi) EM — segment the
  * word table under current piece costs, re-estimate costs from the
  * winning segmentations — then prune to the vocabulary target keeping
  * every single character (totality). Application is
  * [[graft.functions.UnigramTokenIds]]/[[graft.functions.UnigramTokenCount]].
  *
  * Scale shape — the SAME bounded-training contract as BPE
  * ([[BpeTokenizer.trainCached]]): the corpus reduces to its top
  * `maxWords` (word, count) heavy hitters (partial-agg +
  * TakeOrderedAndProject, one deliberately bounded driver collect);
  * EM runs driver-local over that table — `EmIters` Viterbi passes
  * over ≤ maxWords short words. The trained artifact is ≤ vocabTarget
  * (piece, costMicro) rows, shipped inside the apply expression.
  *
  * Determinism (what makes the oracle possible): substring seeding and
  * count accumulation iterate the word table in its deterministic
  * (count DESC, word ASC) order; piece probabilities become INTEGER
  * micro-nat costs via StrictMath.log (bit-identical across JVMs)
  * before any segmentation compares them; Viterbi tie-breaks are the
  * single-integer-key rule the apply expression and the generated SQL
  * share; pruning orders by (count DESC, piece ASC). The FINAL
  * artifact is pieces sorted by string with id = index — embedding it
  * as a VALUES table fully determines the oracle's DP.
  */
object UnigramLmTokenizer {

  /** Longest candidate piece, in code points — the DP lookback bound
    * `P` shared by trainer, apply expression and generated SQL. */
  val MaxPieceLen = 6

  /** Seed substrings below this corpus count are never candidates
    * (the BPE MinPairCount analog — a once-seen substring is noise). */
  val MinPieceCount = 2L

  /** Hard-EM rounds. The tiny gate corpus converges immediately;
    * production corpora plateau within a handful (Kudo's sub-EM
    * iteration counts are single digits too). */
  val EmIters = 3

  /** The trained model: pieces sorted by string (id = index) with
    * integer micro-nat costs, plus the corpus's max word length in
    * code points — the generated oracle's DP unroll depth. */
  final case class Model(pieces: Seq[(String, Long)], maxWordLen: Int) {
    def table: UnigramTable = new UnigramTable(pieces, MaxPieceLen)
  }

  // the ONE shared code-point split (BpeTable.codePointStrings) — the
  // trainer's substring windows must match the DP's and DuckDB's
  private def codePoints(w: String): Array[String] =
    graft.functions.BpeTable.codePointStrings(w)

  private def costsFrom(counts: collection.Map[String, Long],
      vocab: Seq[String]): Seq[(String, Long)] = {
    // Laplace-smoothed -ln p in micro-nats: integer inputs, one
    // StrictMath.log per piece, round half-up — deterministic
    val total = counts.values.sum.toDouble + vocab.size.toDouble
    vocab.map { p =>
      val c = counts.getOrElse(p, 0L).toDouble + 1.0
      (p, Math.round(-StrictMath.log(c / total) * 1e6))
    }
  }

  // Viterbi-segment every word under current costs, accumulate piece
  // counts weighted by word count — the E step, running the EXACT
  // segmentation body the apply expression ships (one implementation)
  private def viterbiCounts(wordCounts: Seq[(String, Long)],
      costs: Seq[(String, Long)]): collection.Map[String, Long] = {
    val table = new UnigramTable(costs, MaxPieceLen)
    val acc = new scala.collection.mutable.HashMap[String, Long]()
    wordCounts.foreach { case (w, c) =>
      table.tokenizeWord(w).foreach { p =>
        acc.update(p, acc.getOrElse(p, 0L) + c)
      }
    }
    acc
  }

  /** The training loop, driver-local over the bounded word table. */
  def train(wordCounts: Seq[(String, Long)], vocabTarget: Int):
      Seq[(String, Long)] = {
    require(vocabTarget >= 1, s"vocabTarget must be >= 1, got $vocabTarget")
    // seed: every substring up to MaxPieceLen with corpus count >=
    // MinPieceCount, plus EVERY single character (totality floor)
    val seedCounts = new scala.collection.mutable.LinkedHashMap[String, Long]()
    wordCounts.foreach { case (w, c) =>
      val cps = codePoints(w)
      var i = 0
      while (i < cps.length) {
        var j = 1
        val jMax = math.min(MaxPieceLen, cps.length - i)
        while (j <= jMax) {
          val p = cps.slice(i, i + j).mkString
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + c)
          j += 1
        }
        i += 1
      }
    }
    val isSingle = (p: String) => p.codePointCount(0, p.length) == 1
    var vocab: Seq[String] = seedCounts.collect {
      case (p, c) if c >= MinPieceCount || isSingle(p) => p
    }.toSeq.sorted
    var costs = costsFrom(seedCounts, vocab)
    // hard EM: pieces the Viterbi never uses fall out (singles stay)
    (0 until EmIters).foreach { _ =>
      val counts = viterbiCounts(wordCounts, costs)
      vocab = vocab.filter(p => isSingle(p) || counts.getOrElse(p, 0L) > 0L)
      costs = costsFrom(counts, vocab)
    }
    // prune to the target: all singles + top multi-char pieces by
    // final Viterbi count (ties to the lexicographically smaller)
    val finalCounts = viterbiCounts(wordCounts, costs)
    val (singles, multis) = vocab.partition(isSingle)
    val keptMultis = multis
      .sortBy(p => (-finalCounts.getOrElse(p, 0L), p))
      .take(math.max(0, vocabTarget - singles.size))
    val kept = (singles ++ keptMultis).sorted
    // one last E step over the pruned vocabulary fixes the costs the
    // artifact ships (counts move when a pruned piece's mass reflows)
    val keptCosts = costs.filter { case (p, _) => kept.contains(p) }
    costsFrom(viterbiCounts(wordCounts, keptCosts), kept)
  }

  private val trained = new ConcurrentHashMap[(String, Int, Int), Model]()

  def trainCached(docs: DataFrame, datasetKey: String, textCol: String,
      maxWords: Int, vocabTarget: Int): Model =
    trained.computeIfAbsent((datasetKey, maxWords, vocabTarget), _ => {
      val pieces = train(
        BpeTokenizer.wordCounts(docs, textCol, maxWords), vocabTarget)
      // the oracle's DP unroll depth: the FULL corpus's longest word in
      // code points (one partial-agg scan — the heavy-hitter table may
      // miss a rare long word the DP still has to segment)
      val maxLen = docs
        .select(max(expr(
          s"array_max(transform(split($textCol, ' '), w -> length(w)))"))
          .as("m"))
        .collect().headOption.flatMap(r =>
          if (r.isNullAt(0)) None else Some(r.getInt(0))).getOrElse(1)
      Model(pieces, math.max(1, maxLen))
    })

  /** The single model trained for (maxWords, vocabTarget) in this JVM,
    * if unambiguous — the oracle-generation hook (the
    * [[BpeTokenizer.trainedSnapshot]] pattern). */
  def trainedSnapshot(maxWords: Int, vocabTarget: Int): Option[Model] = {
    import scala.jdk.CollectionConverters._
    val distinct = trained.asScala.collect {
      case ((_, mw, vt), m) if mw == maxWords && vt == vocabTarget => m
    }.toSeq.distinct
    if (distinct.size == 1) Some(distinct.head) else None
  }
}
