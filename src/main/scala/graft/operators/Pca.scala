package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over the embedding corpus — the classic dimensionality-
  * reduction / whitening preprocessing of an embedding pipeline
  * (compresses vectors for retrieval, and a trained alternative to the
  * Matryoshka prefix-truncation ann_dim_curve prices: truncation keeps
  * an ARBITRARY coordinate subspace, PCA keeps the variance-optimal
  * one).
  *
  * Scale design mirrors [[IvfIndex]] exactly:
  * - **Training is sampled and one-shot**: mean + covariance + a
  *   cyclic Jacobi eigensolver run driver-local on the SAME bounded
  *   deterministic hash-ordered draw the coarse quantizer trains on
  *   (≤ 4096 vectors; a 64×64 covariance is trivially driver-sized).
  *   Deterministic end to end: fixed sweep count, index-ordered
  *   rotations, eigenvalue-descending order with index tie-break,
  *   sign canonicalized (largest-|component| coordinate positive).
  * - **Projection is a native scan-side expression**: the (k×dim)
  *   component matrix and the mean ride into codegen as one reference
  *   object ([[graft.functions.PcaSet]]) — constant-size generated
  *   code, one pass, no shuffle.
  */
object Pca {

  /** Trained model: `mean` (dim), `components` (k rows × dim,
    * orthonormal, eigenvalue-descending), `eigenvalues` (k, the
    * explained variances). */
  final case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]],
      eigenvalues: Seq[Double])

  def train(vectors: DataFrame, k: Int, maxSample: Int = 4096): PcaModel = {
    val sample = IvfIndex.trainSample(vectors, maxSample)
    val dim = sample(0).length
    require(k <= dim, s"k=$k > dim=$dim")
    val n = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
    }
    locally { var i = 0; while (i < dim) { mean(i) /= n; i += 1 } }
    val cov = Array.ofDim[Double](dim, dim)
    val c = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0; while (i < dim) { c(i) = v(i) - mean(i); i += 1 }
      var p = 0
      while (p < dim) {
        var q = p
        while (q < dim) { cov(p)(q) += c(p) * c(q); q += 1 }
        p += 1
      }
    }
    locally {
      var p = 0
      while (p < dim) {
        var q = p
        while (q < dim) { cov(p)(q) /= n; cov(q)(p) = cov(p)(q); q += 1 }
        p += 1
      }
    }
    val (vals, vecs) = jacobi(cov) // vecs(i)(j): coord i of eigvec j
    // order: eigenvalue DESC, original index ASC on ties
    val order = vals.indices.sortBy(j => (-vals(j), j)).take(k)
    val comps = order.map { j =>
      val v = Array.tabulate(dim)(i => vecs(i)(j))
      // sign canon: the largest-|x| coordinate positive (lowest index
      // on magnitude ties) — eigenvectors are only defined up to sign
      var bi = 0
      var ba = 0.0
      var i = 0
      while (i < dim) {
        val a = math.abs(v(i)); if (a > ba) { ba = a; bi = i }; i += 1
      }
      (if (v(bi) < 0) v.map(-_) else v).toIndexedSeq
    }.toIndexedSeq
    PcaModel(mean.toIndexedSeq, comps, order.map(vals).toIndexedSeq)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic: fixed 12 sweeps over (p < q) in index order,
    * rotations skipped below 1e-12. Returns (eigenvalues, eigenvector
    * matrix with eigvec j in COLUMN j). */
  private[operators] def jacobi(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to 12; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-12) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val cth = 1.0 / math.sqrt(t * t + 1.0)
        val sth = t * cth
        var i = 0
        while (i < n) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = cth * aip - sth * aiq
          a(i)(q) = sth * aip + cth * aiq
          i += 1
        }
        i = 0
        while (i < n) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = cth * api - sth * aqi
          a(q)(i) = sth * api + cth * aqi
          i += 1
        }
        i = 0
        while (i < n) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = cth * vip - sth * viq
          v(i)(q) = sth * vip + cth * viq
          i += 1
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  // one trained model per (dataset, k) per JVM — the IvfIndex cache
  // convention (immutable-snapshot assumption documented there)
  private val trained = new ConcurrentHashMap[(String, Int), PcaModel]()

  def trainCached(vectors: DataFrame, datasetKey: String, k: Int): PcaModel =
    trained.computeIfAbsent((datasetKey, k), _ => train(vectors, k))

  /** The single model trained for k in this JVM, if unambiguous — the
    * oracle-generation hook (the [[IvfIndex.trainedSnapshot]] pattern:
    * Verify runs every query, training the model, BEFORE dumping
    * oracleSql). */
  def trainedSnapshot(k: Int): Option[PcaModel] = {
    import scala.jdk.CollectionConverters._
    val distinct = trained.asScala.collect {
      case ((_, kk), m) if kk == k => m
    }.toSeq.distinct
    if (distinct.size == 1) Some(distinct.head) else None
  }

  /** Project (vec_id, embedding) onto the model's components:
    * (vec_id, proj array<double> of length k), each coordinate
    * y_j = Σ_i (x_i − mean_i)·w_{j,i} accumulated in coordinate order
    * (the oracle's list_sum order), rounded to 6. Pure scan-side
    * native projection — no shuffle. */
  def project(vectors: DataFrame, model: PcaModel): DataFrame =
    vectors.select(col("vec_id"),
      transform(
        graft.functions.PcaProject(
          graft.functions.VectorOps.toDoubleVec(col("embedding")),
          model.mean, model.components),
        y => round(y, 6)).as("proj"))
}
