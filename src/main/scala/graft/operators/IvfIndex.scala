package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
  * corpus into `nlist` cells; a query probes only the `nprobe` nearest
  * cells and scores candidates there.
  *
  * Everything is DataFrame-native:
  * - Lloyd iterations: assignment is an argmin over broadcast centroid
  *   literals (centroids are nlist×dim doubles — kilobytes — the ONE
  *   legitimate driver-side collect in the operator); the update step
  *   computes per-dimension means via posexplode + groupBy(cell, dim).
  * - At 100 TB: each iteration is one scan + one narrow shuffle of
  *   (cell, dim, partial) rows; the index assignment is a scan-side
  *   projection; the probe is a semi-join on cell id — candidates ≈
  *   corpus × nprobe/nlist instead of the full corpus.
  * - Deterministic: seedless — initial centroids are an id-stride
  *   sample, ties in argmin break on cell index.
  */
object IvfIndex {

  /** Relative squared-L2 score vs a centroid: ||v-c||² minus the
    * centroid-independent ||v||² term (argmin over cells is unchanged,
    * and one native dot per centroid instead of two). */
  private def distSqTo(emb: Column, centroid: Seq[Double]): Column = {
    val c = typedlit(centroid)
    lit(centroid.map(x => x * x).sum) -
      lit(2.0) * VectorOps.dotPrecast(emb, c)
  }

  /** argmin cell id over the centroid list (ties → lowest index). */
  private def assignExpr(emb: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSqTo(emb, c).as("d"), lit(i).as("cell"))
    }: _*)).getField("cell")

  /** Train the coarse quantizer: id-stride init + `iters` Lloyd steps.
    * `vectors`: (vec_id, embedding). Returns the centroid matrix. */
  def train(vectors: DataFrame, nlist: Int, iters: Int = 2): Seq[Seq[Double]] = {
    // iterative algorithm → cache the working set: train runs
    // 1 + 2·iters actions over it (standard k-means practice)
    val v = vectors.select(col("vec_id"),
      VectorOps.toDoubleVec(col("embedding")).as("emb"))
      .persist()
    val n = v.count()
    val stride = math.max(1L, n / nlist)
    var centroids: Seq[Seq[Double]] = v
      .filter(col("vec_id") % stride === 0)
      .orderBy(col("vec_id")).limit(nlist)
      .select(col("emb")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq

    for (_ <- 1 to iters) {
      val assigned = v.select(col("emb"), assignExpr(col("emb"), centroids).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("emb")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(map_from_arrays(collect_list(col("pos")), collect_list(col("m"))).as("dims"))
        .collect()
        .map { r =>
          val dims = r.getMap[Int, Double](1)
          r.getInt(0) -> (0 until dims.size).map(dims(_))
        }.toMap
      // keep the old centroid for any cell that lost all members
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    v.unpersist()
    centroids
  }

  /** Assign each corpus vector to its cell (the "inverted file"). */
  def index(vectors: DataFrame, centroids: Seq[Seq[Double]]): DataFrame = {
    val v = vectors.select(col("vec_id"), col("embedding"),
      VectorOps.toDoubleVec(col("embedding")).as("emb"))
    v.select(col("vec_id"), col("emb"),
      VectorOps.norm(col("embedding")).as("v_nrm"),
      assignExpr(col("emb"), centroids).as("cell"))
  }

  /** Top-k by cosine probing the nprobe nearest cells per query. Same
    * output shape as SimilaritySearch.bruteForceTopK. */
  def topK(vectors: DataFrame, queries: DataFrame,
      centroids: Seq[Seq[Double]], k: Int, nprobe: Int = 4): DataFrame = {
    val idx = index(vectors, centroids)
    val q = queries.select(col("query_id"),
      VectorOps.toDoubleVec(col("q_emb")).as("qd_emb"),
      VectorOps.norm(col("q_emb")).as("q_nrm"))
    // nprobe nearest cells per query: explode per-centroid distances, rank
    val qCells = q.select(col("query_id"), col("qd_emb"), col("q_nrm"),
        posexplode(array(centroids.map(c =>
          distSqTo(col("qd_emb"), c)): _*)))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "cell_dist")
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cell_dist").asc, col("cell").asc)
    val probes = qCells.withColumn("cr", row_number().over(wq))
      .filter(col("cr") <= nprobe)
      .select(col("query_id"), col("qd_emb"), col("q_nrm"), col("cell"))

    val scored = idx.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorOps.cosinePrenormed(
          VectorOps.dotPrecast(col("qd_emb"), col("emb")),
          col("q_nrm"), col("v_nrm")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
