package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CentroidAssign, CentroidNearest, VectorOps}

/** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
  * corpus into `nlist` cells; a query probes only the `nprobe` nearest
  * cells and scores candidates there.
  *
  * Scale design (the 100 TB story):
  * - **Training is sampled and one-shot.** The coarse quantizer is
  *   trained on a deterministic id-stride sample (≤ `maxSample` rows,
  *   a few MB) collected once; Lloyd iterations run driver-local on
  *   that sample — the standard IVF practice (faiss trains its
  *   quantizer on a bounded sample too). Per-query retraining and
  *   per-iteration cluster scans are gone.
  * - **Assignment is a native expression.** The centroid matrix rides
  *   into codegen as a reference object ([[graft.functions.CentroidSet]])
  *   — constant-size generated code at any nlist, vs the nlist-wide
  *   literal-struct tree that would Janino-bomb at nlist ≥ 256. The
  *   index step is a pure scan-side projection: one pass, no shuffle.
  * - **Probe is a broadcast semi-join on cell id:** candidates ≈
  *   corpus × nprobe/nlist instead of the full corpus.
  * - Deterministic end to end: seedless stride sampling, strict-<
  *   argmin (ties → lowest cell index), fixed iteration count.
  */
object IvfIndex {

  /** Train the coarse quantizer on a deterministic hash-ordered sample
    * of `vectors` ((vec_id, embedding)); Lloyd runs driver-local on the
    * collected sample. Returns the centroid matrix (nlist × dim).
    *
    * Sampling is ONE corpus scan: order by (xxhash64(vec_id), vec_id)
    * and take `maxSample` — Spark executes this as
    * TakeOrderedAndProject (a per-partition top-k heap, no global
    * sort), so driver memory stays bounded by maxSample and the scan
    * count by 1. (The previous stride sampler cost a count() pass
    * before the sample pass.) The hash order makes the subset a
    * deterministic unbiased draw — id-stride sampling was correlated
    * with ingestion layout. When the corpus is within maxSample the
    * sample is the whole corpus, identical to the old sampler. */
  def train(vectors: DataFrame, nlist: Int, iters: Int = 2,
      maxSample: Int = 4096): Seq[Seq[Double]] =
    lloyd(trainSample(vectors, maxSample), nlist, iters)
      .map(_.toIndexedSeq).toIndexedSeq

  /** The bounded deterministic training draw shared by the coarse
    * quantizer and the PQ codebooks ([[IvfPq]]): hash-ordered top-k
    * (TakeOrderedAndProject — per-partition heaps, one scan, driver
    * memory bounded by maxSample), then vec_id order for the
    * order-sensitive Lloyd init. */
  private[operators] def trainSample(vectors: DataFrame,
      maxSample: Int): Array[Array[Double]] = {
    val v = vectors.select(col("vec_id"),
      VectorOps.toDoubleVec(col("embedding")).as("emb"))
    val sample: Array[Array[Double]] = v
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(maxSample)
      .select(col("vec_id"), col("emb")).collect()
      .sortBy(_.getLong(0)) // Lloyd init is order-sensitive: fix vec_id order
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    sample
  }

  /** Driver-local Lloyd over an in-memory sample — deterministic:
    * index-stride init, fixed iteration count, strict-< argmin (ties →
    * lowest cell), empty cells keep their previous centroid. */
  private[operators] def lloyd(sample: Array[Array[Double]], nlist: Int,
      iters: Int): Array[Array[Double]] = {
    val dim = sample(0).length

    // init: index-stride over the (vec_id-ordered) sample — one seed
    // vector per prospective cell, deterministic
    val initStride = math.max(1, sample.length / nlist)
    var centroids: Array[Array[Double]] =
      Array.tabulate(math.min(nlist, sample.length)) { i =>
        sample(math.min(i * initStride, sample.length - 1)).clone()
      }

    for (_ <- 1 to iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { vec =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val ctr = centroids(c)
          var d = 0.0
          var i = 0
          while (i < dim) { val t = vec(i) - ctr(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += vec(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.indices.map { c =>
        // keep the old centroid for any cell that lost all members
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  // One trained quantizer per (dataset, nlist, iters) per JVM: verify /
  // bench runs execute each registered query several times — the
  // centroids are immutable once trained, so train once and reuse.
  private val trained = new ConcurrentHashMap[(String, Int, Int), Seq[Seq[Double]]]()

  /** Train-once-per-JVM cache. ASSUMES the dataset under `datasetKey`
    * (a directory path) is immutable for the JVM's lifetime — true for
    * the read-only testdata and for any sane production run (an index is
    * always built against a snapshot). If data under the same path were
    * regenerated mid-JVM, stale centroids would be reused: that degrades
    * recall only, never the correctness of returned rows (every
    * candidate is exactly re-scored). */
  def trainCached(vectors: DataFrame, datasetKey: String, nlist: Int,
      iters: Int = 2): Seq[Seq[Double]] =
    trained.computeIfAbsent((datasetKey, nlist, iters),
      _ => train(vectors, nlist, iters))

  /** The single centroid matrix trained for (nlist, iters) in this JVM,
    * if unambiguous — the oracle-generation hook: Verify executes every
    * registered query (training the quantizer) BEFORE dumping oracleSql,
    * so the exact matrix the engine used can be embedded in the
    * generated DuckDB SQL (the planesCte pattern). Returns None when
    * nothing is trained yet or multiple datasets trained distinct
    * matrices (ambiguous → caller omits the oracle, keeping the weaker
    * rows-only check instead of risking a wrong compare). */
  def trainedSnapshot(nlist: Int, iters: Int): Option[Seq[Seq[Double]]] = {
    import scala.jdk.CollectionConverters._
    val distinct = trained.asScala.collect {
      case ((_, nl, it), c) if nl == nlist && it == iters => c
    }.toSeq.distinct
    if (distinct.size == 1) Some(distinct.head) else None
  }

  /** Assign each corpus vector to its cell (the "inverted file"). */
  def index(vectors: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    vectors.select(col("vec_id"),
      VectorOps.toDoubleVec(col("embedding")).as("emb"),
      VectorOps.norm(col("embedding")).as("v_nrm"))
      .withColumn("cell", CentroidAssign(col("emb"), centroids))

  /** Top-k by cosine probing the nprobe nearest cells per query. Same
    * output shape as SimilaritySearch.bruteForceTopK. */
  def topK(vectors: DataFrame, queries: DataFrame,
      centroids: Seq[Seq[Double]], k: Int, nprobe: Int = 4): DataFrame =
    topKFromIndexed(index(vectors, centroids), queries, centroids, k, nprobe)

  /** Probe a PRE-ASSIGNED inverted file — [[index]]'s output, or the
    * persisted [[IvfStore]] table — so the plan runs NO assignment
    * stage over the corpus: candidate cells broadcast onto a bare
    * (bucketed) scan. This is the serving form at 100 TB — the
    * assignment argmin is paid once at ingest, not per query batch.
    * Output is identical to [[topK]] over the same rows (IvfStoreSpec
    * pins both the equality and the plan shape). */
  def topKFromIndexed(indexed: DataFrame, queries: DataFrame,
      centroids: Seq[Seq[Double]], k: Int, nprobe: Int = 4): DataFrame = {
    val probes = queries.select(col("query_id"),
        VectorOps.toDoubleVec(col("q_emb")).as("qd_emb"),
        VectorOps.norm(col("q_emb")).as("q_nrm"))
      .select(col("query_id"), col("qd_emb"), col("q_nrm"),
        explode(CentroidNearest(col("qd_emb"), centroids, nprobe)).as("cell"))

    val scored = indexed.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorOps.cosinePrenormed(
          VectorOps.dotPrecast(col("qd_emb"), col("emb")),
          col("q_nrm"), col("v_nrm")), 4).as("sim"))
    // bounded-heap ranking, not a per-query window: a dense cell can't
    // funnel a query's whole candidate set into one task — see
    // SimilaritySearch.heapTopK
    SimilaritySearch.heapTopK(scored, k)
  }
}
