package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The persisted bucket+vector path for incremental embedding near-dup:
  * probing the stored tables must (a) emit exactly the pair set the
  * recompute form emits, and (b) run NO hyperplane math (and no
  * cast/norm) over the seen corpus — both sides of the probe read bare
  * bucketed scans. */
class EmbStoreSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.as[(Long, Long, Double)].collect().toSet

  private lazy val base = Array.fill(64)(1.0f)
  private def noisy(seed: Int) = {
    val r = new Random(seed)
    base.map(x => x + 0.01f * r.nextGaussian().toFloat).toSeq
  }
  private lazy val ortho = (Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)).toSeq

  test("store probe ≡ recompute form; seen side runs zero hyperplane/norm work") {
    val seen = Seq((1L, noisy(1)), (2L, noisy(2)), (3L, ortho))
      .toDF("vec_id", "embedding")
    val batch = Seq((20L, noisy(3)), (21L, ortho.map(-_)), (22L, ortho.map(-_)))
      .toDF("vec_id", "embedding")
    val store = new EmbStore("graft_emb_store_spec", buckets = 2)
    store.ingest(seen)

    val probe = store.probe(batch, threshold = 0.9)

    // Plan pin: both seen-side inputs are persisted bucketed tables —
    // the hyperplane expression appears ONLY for the batch side, which
    // sits behind its lazy localCheckpoint, so the executed plan must
    // contain no hyperplane bucketing at all.
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("graft_emb_store_spec_buckets"),
      s"candidate join must scan the persisted bucket table:\n$p")
    assert(p.contains("graft_emb_store_spec_vecs"),
      s"verification must scan the persisted vector table:\n$p")
    assert(!p.contains("graft_lsh_buckets"),
      s"no hyperplane math may run above the stored scans:\n$p")

    val got = pairsOf(probe)
    val want = pairsOf(SimilaritySearch.incrementalLshNearDupPairs(
      batch, seen, threshold = 0.9))
    assert(got == want,
      s"store probe must emit exactly the recompute form's pairs; " +
        s"extra=${got -- want} missing=${want -- got}")
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((1L, 20L)) && ids.contains((2L, 20L)) &&
      ids.contains((21L, 22L)) && !ids.contains((1L, 2L)), s"got $ids")
  }

  test("testdata parity: store probe == recompute probe on the sf split") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val batch = vecs.filter(col("vec_id") % 5 === 0)
    val seen = vecs.filter(col("vec_id") % 5 =!= 0)
    val store = new EmbStore("graft_emb_store_sf", buckets = 2)
    store.ingest(seen)
    val got = pairsOf(store.probe(batch, threshold = 0.4))
    val want = pairsOf(SimilaritySearch.incrementalLshNearDupPairs(
      batch, seen, threshold = 0.4))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
  }

  test("one batchId guards both tables: replay is a no-op on buckets AND vectors") {
    val b0 = Seq((1L, noisy(1))).toDF("vec_id", "embedding")
    val store = new EmbStore("graft_emb_store_replay", buckets = 2)
    store.ingest(b0, batchId = 0L)
    val (nb, nv) =
      (store.bucketRows(spark).count(), store.vectorRows(spark).count())
    assert(store.isReplay(0L) && !store.isReplay(1L))
    store.ingest(b0, batchId = 0L) // replay
    assert(store.bucketRows(spark).count() == nb &&
      store.vectorRows(spark).count() == nv,
      "replayed batchId must not double-insert in either table")
    val b1 = Seq((2L, noisy(2))).toDF("vec_id", "embedding")
    store.ingest(b1, batchId = 1L)
    assert(store.vectorRows(spark).count() == nv + 1)
  }

  test("a half-applied merge (bucket-side write failure) degrades SAFE and self-heals on retry") {
    val store = new EmbStore("graft_emb_store_heal", buckets = 2)
    val b0 = Seq((1L, noisy(1))).toDF("vec_id", "embedding")
    val goodBuckets = SimilaritySearch.lshBucketRows(b0)
    val vecs = SimilaritySearch.normalizedVectors(b0)
    // schema-valid but fails at execution time — models an executor
    // OOM/disk failure in the SECOND table's write (the bucket table:
    // merge applies vectors first, precisely so the half-applied state
    // is orphan VECTORS, which generate no candidates — the other
    // order loses pairs silently in the verification join)
    val boom = udf((_: Long) =>
      if (true) throw new RuntimeException("bucket write failure")
      else 0L)
    val badBuckets = goodBuckets.select(col("vec_id"), col("tbl"),
      boom(col("vec_id")).as("bucket"))
    intercept[Exception](store.merge(badBuckets, vecs, batchId = 7L))
    assert(store.vectorRows(spark).count() > 0 &&
      store.bucketRows(spark).count() == 0,
      "the half-applied state must be the safe direction: vectors " +
        "committed (orphans generate no candidates), buckets not")
    // keyed on BOTH tables: reporting 7 as a replay would skip the
    // retry that heals the divergence
    assert(!store.isReplay(7L))
    store.merge(goodBuckets, vecs, batchId = 7L) // the healing retry
    assert(store.bucketRows(spark).count() > 0 && store.isReplay(7L))
    assert(store.vectorRows(spark).select("vec_id").distinct().count() == 1,
      "the retry must not double-insert the already-committed vector side")
  }

  test("a drifted batch cannot half-apply: neither table is touched") {
    val store = new EmbStore("graft_emb_store_halfapply", buckets = 2)
    val okBuckets = Seq((1L, 0, 1L)).toDF("vec_id", "tbl", "bucket")
    // passes the id/emb checks but is missing nrm — without whole-schema
    // validation BEFORE either merge, the bucket table would commit and
    // the vector merge would then throw, leaving orphan bucket rows
    // whose candidates silently vanish in the verification join
    val vecsNoNrm = Seq((1L, Seq(1.0))).toDF("vec_id", "emb")
    val e = intercept[IllegalArgumentException](
      store.merge(okBuckets, vecsNoNrm))
    assert(e.getMessage.contains("nrm"))
    assert(store.bucketRows(spark).count() == 0 &&
      store.vectorRows(spark).count() == 0,
      "both tables must stay untouched when either batch fails validation")
  }

  test("schema drift fails loudly on both tables") {
    val store = new EmbStore("graft_emb_store_drift", buckets = 2)
    val badBuckets = Seq(("a", 0, 1L)).toDF("vec_id", "tbl", "bucket")
    val okVecs = Seq((1L, Seq(1.0), 1.0)).toDF("vec_id", "emb", "nrm")
    val e1 = intercept[IllegalArgumentException](
      store.merge(badBuckets, okVecs))
    assert(e1.getMessage.contains("LONG vec ids"))
    val okBuckets = Seq((1L, 0, 1L)).toDF("vec_id", "tbl", "bucket")
    val badVecs = Seq((1L, Seq(1.0f), 1.0)).toDF("vec_id", "emb", "nrm")
    val e2 = intercept[IllegalArgumentException](
      store.merge(okBuckets, badVecs))
    assert(e2.getMessage.contains("array<double>"))
  }
}
