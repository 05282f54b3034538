package graft.operators

import scala.util.Random

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 4 well-separated clusters × 25 vectors (dim 64). */
  private lazy val clustered = {
    val rnd = new Random(11)
    val bases = Array.fill(4, 64)(rnd.nextGaussian() * 3)
    val rows = for { c <- 0 until 4; i <- 0 until 25 } yield
      (c * 100L + i, bases(c).map(x => (x + 0.2 * rnd.nextGaussian()).toFloat).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  private lazy val queries = clustered
    .where("vec_id IN (0, 100, 200, 300)")
    .toDF("query_id", "q_emb")

  test("k-means training converges to one centroid per planted cluster") {
    val centroids = IvfIndex.train(clustered, nlist = 4, iters = 3)
    assert(centroids.length == 4)
    // every corpus vector's nearest centroid groups it with its own cluster
    val cells = IvfIndex.index(clustered, centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect()
    val byCluster = cells.groupBy(_._1 / 100).map { case (c, rows) =>
      c -> rows.map(_._2).distinct
    }
    byCluster.foreach { case (c, cellIds) =>
      assert(cellIds.length == 1, s"cluster $c split across cells $cellIds")
    }
    assert(byCluster.values.flatten.toSet.size == 4, "clusters must map to distinct cells")
  }

  test("index() works at nlist=256 (reference-object centroids, no literal tree)") {
    val rnd = new Random(7)
    val centroids = IndexedSeq.fill(256)(IndexedSeq.fill(64)(rnd.nextGaussian()))
    val cells = IvfIndex.index(clustered, centroids)
      .select("cell").as[Int].collect()
    assert(cells.length == 100)
    assert(cells.forall(c => c >= 0 && c < 256))
  }

  test("train caches per (dataset, nlist, iters) and samples deterministically") {
    val a = IvfIndex.trainCached(clustered, "spec-clustered", nlist = 4, iters = 3)
    val b = IvfIndex.trainCached(clustered, "spec-clustered", nlist = 4, iters = 3)
    assert(a eq b, "second call must hit the cache, not retrain")
    val fresh = IvfIndex.train(clustered, nlist = 4, iters = 3)
    assert(a == fresh, "training must be deterministic")
  }

  test("train sampling is one scan: top-k heap (TakeOrderedAndProject), no count pass, no global sort") {
    import org.apache.spark.sql.functions._
    // assert on the production shape — a parquet-backed table, where
    // maxRows is unknown so the Limit survives (EliminateLimits strips
    // it over small in-memory relations, which would hide the plan)
    val p = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.VectorOps.toDoubleVec(col("embedding")).as("emb"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected per-partition top-k in:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort must not appear:\n$p")
  }

  test("trainedSnapshot exposes the one cached matrix for oracle generation") {
    val a = IvfIndex.trainCached(clustered, "spec-snapshot", nlist = 6, iters = 1)
    assert(IvfIndex.trainedSnapshot(nlist = 6, iters = 1).contains(a))
    // identical matrices under a second dataset key stay unambiguous
    IvfIndex.trainCached(clustered, "spec-snapshot-2", nlist = 6, iters = 1)
    assert(IvfIndex.trainedSnapshot(nlist = 6, iters = 1).contains(a))
    assert(IvfIndex.trainedSnapshot(nlist = 7, iters = 9).isEmpty)
  }

  test("IVF topk with nprobe=1 matches brute force on separated clusters") {
    val centroids = IvfIndex.train(clustered, nlist = 4, iters = 3)
    val ivf = IvfIndex.topK(clustered, queries, centroids, k = 10, nprobe = 1)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._1, r._2)).toSet
    val brute = SimilaritySearch.bruteForceTopK(clustered, queries, k = 10)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(ivf == brute,
      s"IVF missed ${brute -- ivf}, extra ${ivf -- brute}")
  }
}
