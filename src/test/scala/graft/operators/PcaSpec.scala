package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** PCA training + native projection ([[Pca]]): eigensolver
  * invariants, projection vs a driver-side reference, determinism,
  * and the trained-vs-truncated retrieval claim. Cross-engine value
  * parity runs at the driver gate (embedding_pca / ann_pca_recall). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vectors = graft.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")
  private lazy val model = Pca.train(vectors, k = 8)

  test("components are orthonormal, eigenvalues descending and non-negative") {
    val c = model.components.map(_.toArray).toArray
    for (a <- c.indices; b <- a until c.length) {
      val dot = (0 until 64).map(i => c(a)(i) * c(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"<c$a, c$b> = $dot")
    }
    val ev = model.eigenvalues
    assert(ev.zip(ev.tail).forall { case (x, y) => x >= y - 1e-12 })
    assert(ev.forall(_ >= -1e-9))
    // top-8 of a 64-dim clustered corpus should carry real variance
    assert(ev.head > 0.0)
  }

  test("native projection matches the driver-side reference") {
    val rows = Pca.project(vectors, model)
      .as[(Long, Seq[Double])].collect().toMap
    val raw = vectors.as[(Long, Seq[Float])].collect().toMap
    raw.take(20).foreach { case (id, emb) =>
      val want = model.components.map { w =>
        var acc = 0.0
        var i = 0
        while (i < 64) {
          acc += (emb(i).toDouble - model.mean(i)) * w(i); i += 1
        }
        BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(rows(id) == want, s"vec $id: ${rows(id)} vs $want")
    }
  }

  test("training is deterministic (same draw, same rotations, same signs)") {
    assert(Pca.train(vectors, k = 8) == model)
  }

  test("the trained subspace beats prefix truncation at the same budget") {
    val pcaRecall = graft.packs.SimilarityOps.annPcaRecall(spark, sf)
      .as[(Long, Long, Double)].collect()
    val meanPca = pcaRecall.map(_._3).sum / pcaRecall.length
    val truncated = graft.packs.SimilarityOps.annDimCurve(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .find(_._1 == 8L).get._4
    assert(meanPca >= truncated,
      s"PCA-8 mean recall $meanPca < truncation-8 recall $truncated — " +
        "the trained subspace should never lose to an arbitrary one here")
  }

  test("plan: projection is scan-side — no shuffle, no window") {
    val p = Pca.project(vectors, model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Window"),
      s"projection must not shuffle:\n$p")
    assert(p.contains("graft_pca_project"), s"expected the native expr:\n$p")
  }
}
