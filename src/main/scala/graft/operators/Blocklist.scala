package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase dictionary tagging at corpus scale — the generalized
  * form of C4's page-level banned-words rule (Raffel et al. 2020 §2.2
  * drops any page containing a word from a published blocklist;
  * [[C4Rules]] documents that delegation) and of taxonomy/topic
  * tagging generally: given a phrase list (1..k lowercase words), tag
  * every document with the phrases it contains and how often.
  *
  * Spark-first matching: this is the declarative equivalent of an
  * Aho-Corasick scan. Per distinct phrase LENGTH k in the dictionary,
  * the document's word k-gram positions are enumerated scan-side
  * (`transform(sequence(...))` over the token array — codegen'd, no
  * UDF) and hash-joined against the BROADCAST dictionary. Work scales
  * with corpus tokens × distinct phrase lengths (small constant);
  * the dictionary — thousands of phrases in production — never
  * shuffles, and the only exchange is the per-(doc, phrase) count's
  * partial agg. A trie would beat this only when the dictionary has
  * MANY distinct lengths; published blocklists are 1-3 words.
  *
  * Exactness: tokenization is the shared [[TextAnalysis.tokens]]
  * (split on single space ⇔ DuckDB string_split), grams are exact
  * string joins, hits are exact counts — the oracle repeats the
  * construction verbatim (the list_slice/range idiom the span-dedup
  * oracles already use). Overlapping occurrences each count (both
  * engines enumerate every position). */
object Blocklist {

  /** Built-in demonstration dictionary. The published C4 rule uses the
    * LDNOOBW word list; the engine takes ANY phrase list — this
    * neutral fixture (mixed 1/2/3-word phrases, one deliberately
    * matching nothing) keeps the gate corpus deterministic and the
    * oracle small. */
  val DefaultPhrases: Seq[String] = Seq(
    "big query", "slow scan", "key value", "table table table",
    "graft never emits this phrase")

  private def phraseLen(p: String): Int = p.split(" ").length

  /** (doc_id, term, hits) — one row per document × matched dictionary
    * phrase, hits = number of matching k-gram positions. Docs with no
    * match emit nothing (see [[tagVerdict]] for the every-doc audit). */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String] = DefaultPhrases): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    require(phrases.forall(p => p.trim == p && p.nonEmpty &&
      !p.contains("  ")), s"phrases must be single-space-joined words: " +
      phrases.filterNot(p => p.trim == p && p.nonEmpty && !p.contains("  ")))
    val spark = docs.sparkSession
    import spark.implicits._
    val lens = phrases.map(phraseLen).distinct.sorted
    val dict = broadcast(
      phrases.map(p => (p, phraseLen(p))).toDF("term", "k"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("t"))
    // ONE corpus scan for every phrase length: the per-k (k, gram)
    // position arrays built side by side in the projection, flattened,
    // and exploded once — a per-k union would re-scan the corpus once
    // per distinct length, which is the dominant cost at scale.
    // sequence() is guarded (it DESCENDS when stop < start), so
    // short/empty/NULL docs contribute no grams.
    val emptyKg = array().cast("array<struct<k:int,gram:string>>")
    val perK = lens.map { k =>
      when(size(col("t")) >= k,
          transform(sequence(lit(1), size(col("t")) - k + 1),
            i => struct(lit(k).as("k"),
              array_join(slice(col("t"), i, lit(k)), " ").as("gram"))))
        .otherwise(emptyKg)
    }
    val grams = toks
      .select(col("doc_id"), explode(flatten(array(perK: _*))).as("kg"))
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.gram").as("gram"))
    grams.join(dict, grams("gram") === dict("term") &&
        grams("k") === dict("k"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("hits"))
  }

  /** Per-document blocklist verdict — the audit projection (every doc
    * emits a row; the caller filters on `keep`): matched phrases as a
    * sorted CSV, total hit count, and C4's page semantics
    * (keep = zero matches). */
  def tagVerdict(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String] = DefaultPhrases): DataFrame = {
    val perDoc = phraseHits(docs, idCol, textCol, phrases)
      .groupBy(col("doc_id"))
      .agg(array_join(array_sort(collect_list(col("term"))), ",")
          .as("terms_csv"),
        sum(col("hits")).as("n_hits"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("terms_csv"), lit("")).as("terms_csv"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) === 0L).as("keep"))
  }
}
