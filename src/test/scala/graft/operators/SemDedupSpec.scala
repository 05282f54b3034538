package graft.operators

import scala.util.Random

import graft.SparkSpec

/** SemDeDup (IVF-cell-blocked semantic near-dup) — precision is exact
  * by construction (every candidate is cosine-verified), so the tests
  * pin recall on clustered fixtures, the keep policy, the
  * store-probe ≡ restricted-self-dedup equivalence, and the cell cap.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 3 clusters of 20 vectors (dim 64) around near-orthogonal bases —
    * same shape as SimilaritySearchSpec's fixture: within-cluster
    * cosine ~0.9+, across ~0. */
  private lazy val clustered = {
    val rnd = new Random(11)
    val bases = Array.fill(3, 64)(rnd.nextGaussian())
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val v = bases(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
      (c * 100L + i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private lazy val centroids = IvfIndex.train(clustered, nlist = 4, iters = 3)

  test("semantic pairs: precision exact, high recall vs brute force on clusters") {
    val brute = SimilaritySearch.cosineNearDupPairs(clustered, 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(brute.nonEmpty)
    val sem = SimilaritySearch.semanticNearDupPairs(clustered, centroids, 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    // every emitted pair is a true near-dup (cosine-verified)
    assert(sem.subsetOf(brute), s"false positives: ${sem -- brute}")
    // k-means on cluster-structured data isolates the clusters
    val recall = (brute & sem).size.toDouble / brute.size
    assert(recall >= 0.8, s"semantic recall $recall too low")
  }

  test("keep policy: canonical (min-id) member survives, near-dups drop") {
    // plant an exact duplicate of vector 0 under a larger id
    val planted = clustered.union(
      clustered.where("vec_id = 0").selectExpr("999L AS vec_id", "embedding"))
    val cents = IvfIndex.train(planted, nlist = 4, iters = 3)
    val pairs = SimilaritySearch.semanticNearDupPairs(planted, cents, 0.95)
    val dropped = pairs.select("vec_b").distinct().as[Long].collect().toSet
    val survivors = planted.select("vec_id")
      .join(pairs.select($"vec_b".as("vec_id")).distinct(), Seq("vec_id"), "left_anti")
      .as[Long].collect().toSet
    assert(dropped.contains(999L), "planted duplicate not dropped")
    assert(survivors.contains(0L), "canonical copy did not survive")
    assert(survivors.intersect(dropped).isEmpty)
    assert(survivors.union(dropped) ==
      planted.select("vec_id").as[Long].collect().toSet)
  }

  test("keep-far policy: each cluster's farthest-from-centroid member survives") {
    val survivors = SimilaritySearch.semanticDedupKeepFarthest(
        clustered, centroids, threshold = 0.9)
      .as[Long].collect().toSet

    // driver-side reference: same pair graph → components → max
    // relative distance (ties → min id), via the same arithmetic
    val pairs = SimilaritySearch.semanticNearDupPairs(clustered, centroids, 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long =
      if (parent.getOrElse(x, x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    clustered.select("vec_id").as[Long].collect().foreach(v => parent(v) = v)
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val cs = graft.functions.CentroidSet.fromRows(centroids)
    val embs = clustered.as[(Long, Seq[Float])].collect().toMap
    def relDist(id: Long): Double = {
      val v = embs(id).map(_.toDouble).toArray
      val cell = graft.functions.CentroidSet.assign(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v), cs)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * cs.w(cell * v.length + i); i += 1 }
      cs.normSq(cell) - 2.0 * dot
    }
    val expected = embs.keySet.groupBy(find).values.map { comp =>
      comp.toSeq.map(id => (relDist(id), id))
        .sortBy { case (d, id) => (-d, id) }.head._2
    }.toSet
    assert(survivors == expected,
      s"extra=${survivors -- expected} missing=${expected -- survivors}")
    // the policy actually bites: some multi-member cluster exists and
    // its min-id member is NOT always the survivor
    assert(survivors.size < embs.size)
  }

  test("store probe == full self-dedup restricted to pairs touching the batch") {
    val batch = clustered.where("vec_id % 5 = 0")
    val seen = clustered.where("vec_id % 5 <> 0")
    val store = new IvfStore("graft_semdedup_spec_store")
    store.merge(IvfIndex.index(seen, centroids))

    val probeDf = SimilaritySearch.incrementalSemanticNearDupPairsFromStore(
      batch, store.table(spark), centroids, threshold = 0.9)

    // Plan pin: the seen corpus is the persisted inverted file and the
    // batch's own assignment hides behind its lazy localCheckpoint —
    // the executed probe plan must run ZERO cell-assignment work.
    val p = probeDf.queryExecution.executedPlan.toString
    assert(p.contains("graft_semdedup_spec_store"),
      s"probe must scan the persisted inverted file:\n$p")
    assert(!p.contains("graft_ivf_assign"),
      s"no assignment stage may run above the stored scan:\n$p")

    val probe = probeDf.as[(Long, Long, Double)].collect().toSet
    val full = SimilaritySearch.semanticNearDupPairs(clustered, centroids, 0.9)
      .as[(Long, Long, Double)].collect()
      .filter(p => p._1 % 5 == 0 || p._2 % 5 == 0).toSet
    assert(probe == full)
    assert(probe.nonEmpty)
  }

  test("over-cap cell is dropped before pair generation") {
    // 12 identical vectors: one cell of 12 > cap 10 → no pairs from it;
    // a second, small cluster below the cap still pairs
    val base = Array.fill(64)(1.0f / 8)
    val other = Array.tabulate(64)(i => if (i < 32) 0.5f else -0.5f)
    val rows =
      (0 until 12).map(i => (i.toLong, base.toSeq)) ++
        Seq((100L, other.toSeq), (101L, other.toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val cents = IvfIndex.train(df, nlist = 2, iters = 3)
    val pairs = SimilaritySearch.semanticNearDupPairs(df, cents, 0.9,
        maxCellSize = 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(!pairs.exists(p => p._1 < 12 && p._2 < 12),
      "pairs leaked from the over-cap cell")
    assert(pairs.map(p => (p._1, p._2)) == Set((100L, 101L)))
  }
}
