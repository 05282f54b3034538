package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.IvfIndex

/** Streaming ANN serving must return exactly the batch IVF top-k for
  * the same query vectors — same candidate cells, same rounding, same
  * order — across multiple micro-batches of arriving queries. */
class AnnServeStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new Random(17)
    val bases = Array.fill(4, 64)(rnd.nextGaussian() * 3)
    val rows = for { c <- 0 until 4; i <- 0 until 25 } yield
      (c * 100L + i, bases(c).map(x => (x + 0.2 * rnd.nextGaussian()).toFloat).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  test("stream-static IVF top-k equals batch IvfIndex.topK per arriving query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val centroids = IvfIndex.train(corpus, nlist = 4, iters = 3)
    val queryVecs = corpus.where("vec_id IN (0, 100, 200, 300)")
      .as[(Long, Seq[Float])].collect().toSeq

    val in = MemoryStream[(Long, Seq[Float])]
    val q = AnnServeStream
      .ivfTopKStream(corpus, in.toDF.toDF("query_id", "q_emb"), centroids,
        k = 5, nprobe = 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("ann_serve_out")
      .start()

    try {
      // queries arrive across two separate micro-batches
      in.addData(queryVecs(0), queryVecs(1))
      q.processAllAvailable()
      in.addData(queryVecs(2), queryVecs(3))
      q.processAllAvailable()

      val streamed = spark.table("ann_serve_out")
        .as[(Long, Long, Double, Long)].collect().toSet
      val batch = IvfIndex.topK(corpus,
          queryVecs.toDF("query_id", "q_emb"), centroids, k = 5, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(streamed == batch,
        s"missing ${batch -- streamed}, extra ${streamed -- batch}")
      assert(streamed.map(_._1) == Set(0L, 100L, 200L, 300L))
    } finally q.stop()
  }
}
