package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted band-table path for incremental near-dup (VERDICT r07
  * "What's missing 1"): probing the stored (doc_id, band, band_key)
  * table must (a) emit exactly the pair set the recompute form emits,
  * and (b) run NO signature stage over the seen side — the plan reads
  * the bucketed table, full stop. */
class BandStoreSpec extends SparkSpec {

  private def split(mod: Int) = {
    val docs = Tables.documents(spark, sf)
    (docs.filter(col("doc_id") % mod === 0),
      docs.filter(col("doc_id") % mod =!= 0))
  }

  test("store-backed probe ≡ recompute form, and the seen side never recomputes signatures") {
    val (batch, seen) = split(5)
    val store = new BandStore("graft_band_store_spec")
    store.merge(Dedup.md5Bands(seen, "doc_id", "text"))

    val probe = Dedup.incrementalMinhashLshMd5FromStore(
      batch, store.table(spark),
      Dedup.shingleTable(seen, "doc_id", "text"), "doc_id", "text")

    // Plan pin: the seen side is the persisted bucketed table — no md5
    // digest / signature min-agg may appear anywhere in the probe plan
    // (the batch side's signature stage lives behind its lazy
    // localCheckpoint; the seen side must be a bare table scan).
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("graft_band_store_spec"),
      s"probe must scan the persisted band table:\n$p")
    assert(!p.contains("partial_min(h0") && !p.contains("md5(concat"),
      s"no signature stage may run above the stored-table scan:\n$p")

    val got = probe.select(col("doc_a"), col("doc_b"), round(col("jac"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.incrementalMinhashLshMd5(batch, seen, "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want,
      s"store-backed probe must emit exactly the recompute form's pairs; " +
        s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty, "testdata should contain planted near-dups touching the batch")
  }

  test("production-hash store probe ≡ production recompute form") {
    val (batch, seen) = split(5)
    val store = new BandStore("graft_band_store_prod")
    store.merge(Dedup.minhashBandTable(seen, "doc_id", "text"))
    val got = Dedup.incrementalMinhashLshFromStore(
        batch, store.table(spark),
        Dedup.shingleTable(seen, "doc_id", "text"), "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.incrementalMinhashLsh(batch, seen, "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want,
      s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty)
  }

  test("merge appends a batch-sized segment; compaction folds and preserves the reader window") {
    val s = spark
    import s.implicits._
    val store = new BandStore("graft_band_store_versions", buckets = 2)
    assert(store.table(spark).count() == 0, "empty before first merge")
    store.merge(Seq((1L, 0, "k1"), (1L, 1, "k2")).toDF("doc_id", "band", "band_key"))
    assert(store.table(spark).count() == 2)
    store.merge(Seq((2L, 0, "k1")).toDF("doc_id", "band", "band_key"))
    assert(store.table(spark).count() == 3, "merge must union, not replace")
    // append-only: the second merge wrote ONLY the batch's rows — its
    // segment holds 1 row, the first segment's 2 are untouched. Ids
    // are OPAQUE and monotone, not pinned literals: a fresh store in a
    // warehouse with same-name stale dirs claims PAST them by design
    // (the cold-start sweep's reissued-id discipline)
    val Seq(s1, s2) = store.liveSegments.map(_.toInt)
    assert(s2 == s1 + 1, s"two consecutive claims, got $s1, $s2")
    assert(spark.table(s"graft_band_store_versions_s$s2").count() == 1,
      "a merge must write the batch's rows only, never re-write the store")
    // a reader holding the pre-compaction manifest keeps its segments
    val preCompaction = store.table(spark)
    store.compact(spark)
    assert(store.liveSegments.size == 1, "compaction folds to one segment")
    assert(store.table(spark).count() == 3, "compaction preserves content")
    assert(preCompaction.count() == 3,
      "in-flight readers of the prior manifest must survive a compaction " +
        "(retired segments live one grace generation)")
    // the NEXT compaction drops the grace segments
    store.merge(Seq((3L, 0, "k3")).toDF("doc_id", "band", "band_key"))
    store.compact(spark)
    assert(!spark.catalog.tableExists(s"graft_band_store_versions_s$s1"),
      "grace segments must be dropped by the following compaction")
    assert(store.table(spark).count() == 4)
  }

  test("replayed batchId is a no-op: band rows can't duplicate and skew bucket counts") {
    val s = spark
    import s.implicits._
    val store = new BandStore("graft_band_store_replay", buckets = 2)
    val batch = Seq((1L, 0, "k1"), (2L, 0, "k1")).toDF("doc_id", "band", "band_key")
    store.merge(batch, batchId = 0L)
    store.merge(batch, batchId = 0L) // at-least-once replay
    assert(store.table(spark).count() == 2,
      "replay must not duplicate band rows (doubled bucket counts would " +
        "spuriously trip the bucket cap)")
    store.merge(Seq((3L, 0, "k2")).toDF("doc_id", "band", "band_key"), batchId = 1L)
    assert(store.table(spark).count() == 3)
  }
}
