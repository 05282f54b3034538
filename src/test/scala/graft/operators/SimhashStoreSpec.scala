package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The persisted banded-fingerprint path for incremental SimHash
  * near-dup: probing the stored (doc_id, simhash, band, band_val)
  * table must (a) emit exactly the pair set the recompute form emits,
  * and (b) run NO fingerprint work over the seen side — the plan reads
  * the bucketed table, full stop. Completes the store-backed story
  * across all three dedup families (exact/bloom, minhash/BandStore,
  * simhash/this). */
class SimhashStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private def seenDf = Seq(
    (1L, dupText),
    (2L, dupText),
    (3L, "entirely unrelated corpus document about catalyst physical planning")
  ).toDF("doc_id", "text")
  private def batchDf = Seq(
    (20L, dupText),
    (21L, "fresh batch document with its own words about shuffle partitioning"),
    (22L, "fresh batch document with its own words about shuffle partitioning")
  ).toDF("doc_id", "text")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.as[(Long, Long, Int)].collect().toSet

  test("md5-twin store probe ≡ recompute form; seen side never re-fingerprints") {
    val store = new SimhashStore("graft_simhash_store_spec", buckets = 2)
    store.merge(Dedup.md5SimhashBands(seenDf, "doc_id", "text"))

    val probe = Dedup.incrementalSimhashMd5FromStore(
      batchDf, store.table(spark), "doc_id", "text")

    // Plan pin: the seen side is the persisted bucketed table — no md5
    // digest / token-vote aggregation may appear anywhere in the probe
    // plan (the batch side's fingerprint stage lives behind its lazy
    // localCheckpoint; the seen side must be a bare table scan).
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("graft_simhash_store_spec"),
      s"probe must scan the persisted banded-fingerprint table:\n$p")
    assert(!p.contains("md5("),
      s"no fingerprint stage may run above the stored-table scan:\n$p")

    val got = pairsOf(probe)
    val want = pairsOf(
      Dedup.incrementalSimhashMd5(batchDf, seenDf, "doc_id", "text"))
    assert(got == want,
      s"store probe must emit exactly the recompute form's pairs; " +
        s"extra=${got -- want} missing=${want -- got}")
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((1L, 20L)) && ids.contains((2L, 20L)) &&
      ids.contains((21L, 22L)) && !ids.contains((1L, 2L)), s"got $ids")
  }

  test("production-hash store probe ≡ production recompute form") {
    val store = new SimhashStore("graft_simhash_store_prod", buckets = 2)
    store.merge(Dedup.simhashBands(seenDf, "doc_id", "text"))
    val probe = Dedup.incrementalSimhashFromStore(
      batchDf, store.table(spark), "doc_id", "text")
    val p = probe.queryExecution.executedPlan.toString
    assert(!p.contains("graft_simhash64"),
      s"no fingerprint stage may run above the stored-table scan:\n$p")
    val got = pairsOf(probe)
    val want = pairsOf(
      Dedup.incrementalSimhash(batchDf, seenDf, "doc_id", "text"))
    assert(got == want,
      s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty)
  }

  test("testdata parity: store probe == recompute probe on the sf split") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val seen = docs.filter(col("doc_id") % 5 =!= 0)
    val store = new SimhashStore("graft_simhash_store_sf", buckets = 2)
    store.merge(Dedup.md5SimhashBands(seen, "doc_id", "text"))
    val got = pairsOf(Dedup.incrementalSimhashMd5FromStore(
      batch, store.table(spark), "doc_id", "text"))
    val want = pairsOf(
      Dedup.incrementalSimhashMd5(batch, seen, "doc_id", "text"))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
  }

  test("schema drift fails loudly: non-long ids or fingerprints") {
    val store = new SimhashStore("graft_simhash_store_drift", buckets = 2)
    val badId = Seq(("a", 1L, 0, 1L)).toDF("doc_id", "simhash", "band", "band_val")
    val e1 = intercept[IllegalArgumentException](store.merge(badId))
    assert(e1.getMessage.contains("LONG doc ids"))
    val badFp = Seq((1L, 1, 0, 1L)).toDF("doc_id", "simhash", "band", "band_val")
    val e2 = intercept[IllegalArgumentException](store.merge(badFp))
    assert(e2.getMessage.contains("LONG fingerprints"))
  }
}
