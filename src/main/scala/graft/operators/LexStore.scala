package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted posting table — the lexical-search index
  * [[TextAnalysis.bm25Search]]'s store-backed form probes: one row per
  * distinct (doc_id, term) with the in-doc term frequency and the
  * document length, bucketed by term so a keyword probe reads the
  * query terms' buckets pre-partitioned (and parquet min/max on the
  * term column prunes the rest).
  *
  * The inline form re-tokenizes the ENTIRE corpus per query batch —
  * the dominant cost, paid forever. This store pays tokenization once
  * per ingested batch; query-time work is posting-sized: df is a
  * partial agg on ≤ |Q| terms, N/avgdl come from the per-doc firsts of
  * the (doc_id, dl) columns (a narrow two-column pass — a production
  * deployment would additionally keep running (N, Σdl) counters; the
  * pass keeps this form self-contained and exactly oracle-equal).
  * Maintenance is the shared append-only segment machinery
  * ([[SegmentedBucketedStore]]); batchId makes replays no-ops. */
final class LexStore(name: String, buckets: Int = 32,
    pointer: graft.streaming.StorePointer = new graft.streaming.InMemoryPointer)
    extends SegmentedBucketedStore(name, "term", buckets, pointer) {

  override protected def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Long, Long)].toDF("doc_id", "term", "tf", "dl")
  }

  override protected def normalize(batch: DataFrame): DataFrame = {
    require(batch.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"LexStore stores LONG doc ids, got " +
        s"${batch.schema("doc_id").dataType.catalogString} — map ids to " +
        "a surrogate long (e.g. xxhash64) first")
    batch.select(col("doc_id"), col("term"), col("tf"), col("dl"))
  }

  /** Publish an ACCEPTED batch's postings: per distinct (doc, term),
    * the term frequency and the doc length. `explode_outer`, not
    * `explode`: a NULL-text doc has zero tokens and a plain explode
    * would drop its rows entirely, silently removing the doc from the
    * probe's N/avgdl (which the inline [[TextAnalysis.bm25Search]]
    * derives from EVERY doc row). The outer explode keeps one
    * (doc_id, NULL-term) sentinel posting — NULL never equals a query
    * term so it can't score, but it carries the doc's `dl` into
    * [[bm25]]'s docLens, keeping store == inline on such corpora. */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      batchId: Long = graft.streaming.VersionedParquetStore.NoBatchId): Unit = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
    val dl = docs.select(col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("dl"))
    merge(tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id")), batchId)
  }

  /** BM25 top-k from the PERSISTED postings — identical output to the
    * inline [[TextAnalysis.bm25Search]] over the same ingested corpus
    * (the scoring tail is shared code), zero re-tokenization. */
  def bm25(queryTerms: DataFrame, k: Int = TextAnalysis.Bm25TopK): DataFrame = {
    val spark = queryTerms.sparkSession
    val postings = table(spark)
    val docLens = postings.groupBy(col("doc_id"))
      .agg(min(col("dl")).as("dl"))
    TextAnalysis.bm25FromPostings(postings, docLens, queryTerms, k)
  }
}
