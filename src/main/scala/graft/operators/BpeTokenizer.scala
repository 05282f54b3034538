package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding merge table (Sennrich et al.,
  * ACL 2016 — the published algorithm): start from per-word codepoint
  * sequences, repeatedly merge the most frequent adjacent symbol pair.
  * Application is [[graft.functions.BpeTokens]]/[[graft.functions.BpeTokenCount]].
  *
  * Scale shape — the same bounded-training contract as IVF
  * ([[IvfIndex.trainCached]]): the corpus reduces to its top
  * `maxWords` (word, count) heavy hitters via a partially-aggregated
  * groupBy + TakeOrderedAndProject (per-partition top-N heaps, no
  * global sort), a DELIBERATELY bounded driver collect; the merge loop
  * then runs driver-local over that table — `numMerges` passes over
  * ≤ maxWords short words, milliseconds. Zipf's law makes the
  * heavy-hitter table the right training set: the mass not covered by
  * the top words is exactly the mass BPE would segment to rare
  * subwords anyway. The trained artifact is ≤ numMerges rows — it
  * ships inside the apply expression (broadcast by construction, the
  * DSIR hashed-model property).
  *
  * Determinism (what makes the oracle possible): the heavy-hitter draw
  * orders by (count DESC, word ASC); pair counting follows the
  * published per-position sum (each adjacent position contributes its
  * word's count — overlapping occurrences each count); the best pair
  * is max count with ties to the lexicographically smallest (a, b);
  * merging within a word is left-to-right non-overlapping (the same
  * greedy pass the apply expression runs); training stops early when
  * no pair occurs at least `MinPairCount` times. Re-runs, engines and
  * partitionings agree exactly.
  */
object BpeTokenizer {

  /** Pairs below this corpus count stop the training loop — merging a
    * once-seen pair memorizes noise, the published stop rule. */
  val MinPairCount = 2L

  /** Bounded (word, count) heavy-hitter table: the training corpus.
    * Deterministic draw — orderBy(count DESC, word ASC).limit plans as
    * TakeOrderedAndProject over a partially-aggregated groupBy. */
  def wordCounts(docs: DataFrame, textCol: String,
      maxWords: Int): Seq[(String, Long)] =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** The published training loop, driver-local over the bounded word
    * table. Returns merges in rank order (the order apply folds in). */
  def train(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // words as mutable symbol sequences (the ONE shared code-point
    // split — graft.functions.BpeTable.codePointStrings), with counts
    var words: Vector[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (graft.functions.BpeTable.codePointStrings(w), c)
    }.toVector
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // pair counts: every adjacent position contributes its word count
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties to lexicographically smallest (a, b)
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < MinPairCount) exhausted = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val merged = a + b
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
    }
    merges.toSeq
  }

  // One trained merge table per (dataset, maxWords, numMerges) per JVM:
  // verify/bench execute each registered query several times; the
  // corpus under a dataset key is immutable for the JVM's lifetime
  // (the IvfIndex.trainCached contract, same caveats).
  private val trained =
    new ConcurrentHashMap[(String, Int, Int), Seq[(String, String)]]()

  def trainCached(docs: DataFrame, datasetKey: String, textCol: String,
      maxWords: Int, numMerges: Int): Seq[(String, String)] =
    trained.computeIfAbsent((datasetKey, maxWords, numMerges),
      _ => train(wordCounts(docs, textCol, maxWords), numMerges))

  /** The single merge table trained for (maxWords, numMerges) in this
    * JVM, if unambiguous — the oracle-generation hook (the
    * IvfIndex.trainedSnapshot pattern): Verify executes every
    * registered query (training the table) BEFORE dumping oracleSql,
    * so the exact merges the engine used are embedded in the generated
    * DuckDB SQL. None when untrained or ambiguous → caller omits the
    * oracle (weaker rows-only check) rather than risking a wrong
    * compare. */
  def trainedSnapshot(maxWords: Int,
      numMerges: Int): Option[Seq[(String, String)]] = {
    import scala.jdk.CollectionConverters._
    val distinct = trained.asScala.collect {
      case ((_, mw, nm), m) if mw == maxWords && nm == numMerges => m
    }.toSeq.distinct
    if (distinct.size == 1) Some(distinct.head) else None
  }

  // Byte-level twin caches: same contract, DISJOINT from the codepoint
  // tables (the two alphabets must never cross-pollinate a snapshot).
  private val trainedBytes =
    new ConcurrentHashMap[(String, Int, Int), Seq[(String, String)]]()

  /** BYTE-LEVEL training (GPT-2 lineage): each heavy-hitter word is
    * re-expressed as its [[graft.functions.ByteLevel]]-mapped UTF-8
    * byte symbols, then the IDENTICAL published merge loop runs — the
    * base alphabet is the closed 256-byte set, so exotic input grows
    * subword coverage, never the alphabet. Same bounded-collect scale
    * shape as [[trainCached]]. */
  def trainCachedBytes(docs: DataFrame, datasetKey: String, textCol: String,
      maxWords: Int, numMerges: Int): Seq[(String, String)] =
    trainedBytes.computeIfAbsent((datasetKey, maxWords, numMerges),
      _ => train(
        wordCounts(docs, textCol, maxWords).map { case (w, c) =>
          (graft.functions.ByteLevel.encode(w), c)
        }, numMerges))

  /** [[trainedSnapshot]]'s byte-level twin. */
  def trainedSnapshotBytes(maxWords: Int,
      numMerges: Int): Option[Seq[(String, String)]] = {
    import scala.jdk.CollectionConverters._
    val distinct = trainedBytes.asScala.collect {
      case ((_, mw, nm), m) if mw == maxWords && nm == numMerges => m
    }.toSeq.distinct
    if (distinct.size == 1) Some(distinct.head) else None
  }
}
