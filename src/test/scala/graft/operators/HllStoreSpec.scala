package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted mergeable HLL sketches ([[HllStore]]): the union of
  * per-batch sketches equals a single-pass sketch of the whole corpus
  * (lossless merge — the property the store's accuracy claim rides
  * on), replays don't double-merge, and the estimate honors the gated
  * 10% claim. */
class HllStoreSpec extends SparkSpec {
  import spark.implicits._

  test("union of batch sketches == single-pass sketch; replay is a no-op") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    val store = new HllStore(s"graft_hll_spec_${System.nanoTime()}")
    store.ingest(docs.filter(col("doc_id") % 2 === 0), "source", "text", 1L)
    store.ingest(docs.filter(col("doc_id") % 2 =!= 0), "source", "text", 2L)
    val merged = store.estimates(spark)
      .as[(String, Long)].collect().toMap
    val single = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("term"))).as("est"))
      .as[(String, Long)].collect().toMap
    assert(merged.nonEmpty && merged == single,
      s"lossless-union violated: ${merged.toSeq.sorted.take(3)} vs " +
        s"${single.toSeq.sorted.take(3)}")
    // replay of batch 2: no growth, same estimates
    store.ingest(docs.filter(col("doc_id") % 2 =!= 0), "source", "text", 2L)
    assert(store.estimates(spark).as[(String, Long)].collect().toMap == merged)
    // the gated claim holds with margin at this scale
    val exact = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("source"))
      .agg(countDistinct(col("term")).as("n")).as[(String, Long)].collect().toMap
    merged.foreach { case (s, est) =>
      assert(math.abs(est - exact(s)).toDouble / exact(s) <= 0.1,
        s"source $s: est $est vs exact ${exact(s)}")
    }
  }
}
