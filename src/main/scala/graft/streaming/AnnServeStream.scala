package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CentroidNearest, TopKByScore, VectorOps}
import graft.operators.IvfIndex

/** Streaming ANN serving: top-k cosine neighbors from a STATIC indexed
  * corpus for an unbounded stream of query vectors — the vector-search
  * serving pattern (fixed index, live queries).
  *
  * Plan shape: the corpus is IVF-indexed once (cell assignment is a
  * scan-side native expression); each arriving query explodes into its
  * `nprobe` nearest cells and **stream-static joins** the index on cell
  * id — a STATELESS join (no watermark, no join state: the static side
  * is re-resolved per micro-batch, so index refreshes are picked up
  * automatically). Scoring reuses the prenormed-cosine expressions, and
  * per-query top-k runs through the bounded-heap aggregate
  * ([[TopKByScore]]) in update mode — map-side combine keeps the
  * shuffle at |queries|·k rows per batch.
  *
  * State story: the top-k AGGREGATE is the one stateful operator, one
  * state row per group key. Pass `tsCol` (query arrival time) to key
  * the aggregate on the watermarked event-time column — Spark then
  * evicts a query's state once the watermark passes its timestamp, so
  * serving state tracks the arrival horizon, not total queries served
  * (asserted in StateSoakSpec). Without `tsCol` the key is query_id
  * alone and state grows with the distinct-query count — acceptable
  * only for bounded query-id spaces (a re-scored dashboard, a replay);
  * a forever-serving deployment must pass `tsCol`.
  *
  * Output rows are bit-identical to the batch `IvfIndex.topK` for the
  * same query vectors (same candidate cells, same rounding, same total
  * order) — pinned in AnnServeStreamSpec.
  */
object AnnServeStream {

  /** `staticVectors`: batch (vec_id, embedding); `queryStream`:
    * streaming (query_id, q_emb[, tsCol]). Returns update-mode
    * (query_id, vec_id, sim, rk). */
  def ivfTopKStream(
      staticVectors: DataFrame,
      queryStream: DataFrame,
      centroids: Seq[Seq[Double]],
      k: Int = 10,
      nprobe: Int = 4,
      tsCol: Option[String] = None,
      watermark: String = "60 seconds"): DataFrame = {
    val idx = IvfIndex.index(staticVectors, centroids)
    val withWm = tsCol match {
      case Some(t) => queryStream.filter(col(t).isNotNull).withWatermark(t, watermark)
      case None => queryStream
    }
    val tsCols = tsCol.map(col).toSeq
    val probes = withWm
      .filter(col("query_id").isNotNull && col("q_emb").isNotNull)
      .select(col("query_id") +: tsCols :+
        VectorOps.toDoubleVec(col("q_emb")).as("qd_emb") :+
        VectorOps.norm(col("q_emb")).as("q_nrm"): _*)
      .select(col("query_id") +: tsCols :+ col("qd_emb") :+ col("q_nrm") :+
        explode(CentroidNearest(col("qd_emb"), centroids, nprobe)).as("cell"): _*)
    probes.join(idx, "cell") // stream-static: stateless, index re-read per batch
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id") +: tsCols :+ col("vec_id") :+
        round(VectorOps.cosinePrenormed(
          VectorOps.dotPrecast(col("qd_emb"), col("emb")),
          col("q_nrm"), col("v_nrm")), 4).as("sim"): _*)
      // keying the aggregate on the watermarked event-time column is
      // what lets Spark evict a finished query's heap state
      .groupBy(col("query_id") +: tsCols: _*)
      .agg(TopKByScore(col("sim"), col("vec_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"),
        col("col.id").as("vec_id"),
        col("col.score").as("sim"),
        (col("pos") + 1).cast("long").as("rk"))
  }
}
