package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The persisted inverted-file path for IVF ANN serving: probing the
  * stored (vec_id, emb, v_nrm, cell) table must (a) return exactly the
  * recompute form's top-k, and (b) run NO assignment stage over the
  * corpus — the plan reads the bucketed table, full stop. Ingest is
  * incremental: batches of new vectors are assigned and merged, and
  * the probe sees the union. */
class IvfStoreSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
    df.select(col("query_id"), col("vec_id"), col("sim"), col("rk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  private def queriesDf = Tables.embeddings(spark, sf)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  test("store-backed probe ≡ recompute form, and the corpus side never re-assigns") {
    val vectors = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val centroids = IvfIndex.train(vectors, nlist = 16, iters = 2)
    val store = new IvfStore("graft_ivf_store_spec", buckets = 4)
    store.merge(IvfIndex.index(vectors, centroids))

    val probe = IvfIndex.topKFromIndexed(store.table(spark), queriesDf,
      centroids, k = 10, nprobe = 4)

    // Plan pin: the corpus side is the persisted bucketed table — the
    // assignment expression (graft_ivf_assign) must not appear anywhere
    // in the probe plan; the query side's probe-list expression
    // (graft_ivf_probes) is the only centroid math left.
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("graft_ivf_store_spec"),
      s"probe must scan the persisted inverted file:\n$p")
    assert(!p.contains("graft_ivf_assign"),
      s"no assignment stage may run above the stored-table scan:\n$p")
    assert(p.contains("graft_ivf_probes"),
      s"query-side probe-list expression expected in the plan:\n$p")

    val got = rows(probe)
    val want = rows(IvfIndex.topK(vectors, queriesDf, centroids,
      k = 10, nprobe = 4))
    assert(got == want,
      s"store probe must return exactly the recompute form's top-k; " +
        s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty)
  }

  test("incremental ingest: batches accumulate; probe == batch index over the union") {
    val vectors = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val centroids = IvfIndex.train(vectors, nlist = 16, iters = 2)
    val store = new IvfStore("graft_ivf_store_ingest", buckets = 4)

    // three arrival waves; replay wave 1 (at-least-once) must be a no-op
    val waves = Seq(
      vectors.filter(col("vec_id") % 3 === 0),
      vectors.filter(col("vec_id") % 3 === 1),
      vectors.filter(col("vec_id") % 3 === 2))
    graft.streaming.StreamingPipelines.annIngestBatch(
      store, centroids, waves(0), batchId = 0L)
    graft.streaming.StreamingPipelines.annIngestBatch(
      store, centroids, waves(1), batchId = 1L)
    val before = store.table(spark).count()
    graft.streaming.StreamingPipelines.annIngestBatch(
      store, centroids, waves(1), batchId = 1L) // replay
    assert(store.table(spark).count() == before,
      "replayed batchId must not double-insert vectors")
    graft.streaming.StreamingPipelines.annIngestBatch(
      store, centroids, waves(2), batchId = 2L)

    assert(store.table(spark).count() == vectors.count(),
      "every vector ingested exactly once")
    val got = rows(IvfIndex.topKFromIndexed(store.table(spark), queriesDf,
      centroids, k = 10, nprobe = 4))
    val want = rows(IvfIndex.topK(vectors, queriesDf, centroids,
      k = 10, nprobe = 4))
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
  }

  test("offline rebuild: re-assigns under new centroids, publishes atomically, old readers keep the grace window") {
    val vectors = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cA = IvfIndex.train(vectors, nlist = 16, iters = 2)
    val cB = IvfIndex.train(vectors, nlist = 8, iters = 2)
    val store = new IvfStore("graft_ivf_store_rebuild", buckets = 4)
    store.merge(IvfIndex.index(vectors.filter(col("vec_id") % 2 === 0), cA))
    store.merge(IvfIndex.index(vectors.filter(col("vec_id") % 2 =!= 0), cA))
    val total = store.table(spark).count()
    val oldReader = store.table(spark) // holds the pre-rebuild manifest

    store.rebuild(spark, cB)
    assert(store.liveSegments.size == 1,
      "rebuild publishes ONE fresh segment (probes get the bare bucketed scan back)")
    assert(store.table(spark).count() == total, "rebuild re-assigns, never drops")
    // probing the rebuilt file under the NEW centroids == a from-scratch
    // index + probe over the same vectors
    val got = rows(IvfIndex.topKFromIndexed(store.table(spark), queriesDf,
      cB, k = 10, nprobe = 4))
    val want = rows(IvfIndex.topK(vectors, queriesDf, cB, k = 10, nprobe = 4))
    assert(got == want,
      s"rebuilt probe must equal the from-scratch form; " +
        s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty)
    // a reader that planned BEFORE the rebuild still sees the OLD
    // inverted file (its segments live one grace generation)
    assert(oldReader.count() == total,
      "mid-rebuild readers of the prior manifest must be unaffected")
    val oldCells = oldReader.select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val wantOld = IvfIndex.index(vectors, cA).select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(oldCells == wantOld,
      "mid-rebuild readers must see the pre-rebuild assignment")
  }

  test("schema drift fails loudly: non-long ids, non-double embeddings") {
    val s = spark
    import s.implicits._
    val store = new IvfStore("graft_ivf_store_drift", buckets = 2)
    val badId = Seq(("a", Seq(1.0), 1.0, 0)).toDF("vec_id", "emb", "v_nrm", "cell")
    val e1 = intercept[IllegalArgumentException](store.merge(badId))
    assert(e1.getMessage.contains("LONG vec ids"))
    val badEmb = Seq((1L, Seq(1.0f), 1.0, 0)).toDF("vec_id", "emb", "v_nrm", "cell")
    val e2 = intercept[IllegalArgumentException](store.merge(badEmb))
    assert(e2.getMessage.contains("array<double>"))
  }
}
