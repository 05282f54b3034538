package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis
import graft.packs.TextOps

/** The corpus-relative streaming curation (mixture gate emit-time,
  * quality floor read-time) must equal the batch composition
  * stratifiedSample ∩ qualityFloor on every finalized horizon. */
class CurateRelativeSpec extends SparkSpec {
  import spark.implicits._

  private val KeepFrac = 0.6

  private def textOf(i: Long): String = (i % 3) match {
    case 0 => Seq.fill(8)("the quick brown fox is of a kind and").mkString(" ") + s" marker $i"
    case 1 => s"plain words with the and of number $i mixed in shortish text"
    case _ => s"$i 88 12 99 ${i * 7} 3 4 5"
  }

  private def docsUpTo(n: Long) =
    (1L to n).map(i => (i, "en", textOf(i))).toDF("doc_id", "lang", "text")

  private def batchExpected(n: Long): Set[Long] = {
    val docs = docsUpTo(n)
    val floor = TextAnalysis.qualityFloor(docs, "doc_id", "text", KeepFrac)
      .select("doc_id")
    TextAnalysis.stratifiedSample(docs, "lang", "doc_id",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp)
      .join(floor, "doc_id")
      .select("doc_id").as[Long].collect().toSet
  }

  test("stream (mixture emit-time, relative floor read-time) == batch composition per horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new QualityFloorStore(KeepFrac)
    val in = MemoryStream[(Long, String, String)]
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = in.toDF.toDF("doc_id", "lang", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = StreamingPipelines.curateRelativeBatch(store, batch,
          "doc_id", "text", "lang", TextOps.SampleRatesBp, TextOps.SampleDefaultBp,
          batchId)
        val rows = kept.select(col("doc_id"), col("quality_bp"))
          .as[(Long, Long)].collect()
        sunk.synchronized { sunk ++= rows }
        ()
      }.start()

    def streamCurated(): Set[Long] = {
      val sink = sunk.synchronized { sunk.toSeq }.toDF("doc_id", "quality_bp")
      store.curated(sink).select("doc_id").as[Long].collect().toSet
    }

    try {
      in.addData((1L to 15L).map(i => (i, "en", textOf(i))))
      q.processAllAvailable()
      assert(streamCurated() == batchExpected(15L),
        s"horizon 1: ${streamCurated()} vs ${batchExpected(15L)}")

      in.addData((16L to 40L).map(i => (i, "en", textOf(i))))
      q.processAllAvailable()
      // the new mass shifts the floor — docs already sunk can gain or
      // lose their verdict retroactively, exactly like a batch re-run
      assert(streamCurated() == batchExpected(40L),
        s"horizon 2: ${streamCurated()} vs ${batchExpected(40L)}")
    } finally q.stop()
  }

  // two languages at different quality levels — the grouped floor must
  // cut each independently (the global floor would starve "xx")
  private def langOf(i: Long): String = if (i % 2 == 0) "en" else "xx"
  private def mlTextOf(i: Long): String = (i % 3, i % 2) match {
    case (0, 0) => Seq.fill(8)("the quick brown fox is of a kind and").mkString(" ") + s" marker $i"
    case (_, 0) => s"plain words with the and of number $i mixed in shortish text"
    case (0, 1) => s"wort folge ohne treffer nummer $i lang genug geschrieben hier"
    case (_, 1) => s"$i 88 12 99 ${i * 7} 3 4 5"
  }
  private def mlDocsUpTo(n: Long) =
    (1L to n).map(i => (i, langOf(i), mlTextOf(i))).toDF("doc_id", "lang", "text")

  private def mlBatchExpected(n: Long): Set[Long] = {
    val docs = mlDocsUpTo(n)
    val floor = TextAnalysis
      .qualityFloorByGroup(docs, "doc_id", "text", "lang", KeepFrac)
      .select("doc_id")
    TextAnalysis.stratifiedSample(docs, "lang", "doc_id",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp)
      .join(floor, "doc_id")
      .select("doc_id").as[Long].collect().toSet
  }

  test("grouped stream curation == batch stratifiedSample ∩ qualityFloorByGroup per horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new GroupedQualityFloorStore(KeepFrac, "lang")
    val in = MemoryStream[(Long, String, String)]
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val q = in.toDF.toDF("doc_id", "lang", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = StreamingPipelines.curateRelativeByGroupBatch(store,
          batch, "doc_id", "text", "lang", TextOps.SampleRatesBp,
          TextOps.SampleDefaultBp, batchId)
        val rows = kept.select(col("doc_id"), col("lang"), col("quality_bp"))
          .as[(Long, String, Long)].collect()
        sunk.synchronized { sunk ++= rows }
        ()
      }.start()

    def streamCurated(): Set[Long] = {
      val sink = sunk.synchronized { sunk.toSeq }
        .toDF("doc_id", "lang", "quality_bp")
      store.curated(sink).select("doc_id").as[Long].collect().toSet
    }

    try {
      in.addData((1L to 15L).map(i => (i, langOf(i), mlTextOf(i))))
      q.processAllAvailable()
      assert(streamCurated() == mlBatchExpected(15L),
        s"horizon 1: ${streamCurated()} vs ${mlBatchExpected(15L)}")

      in.addData((16L to 40L).map(i => (i, langOf(i), mlTextOf(i))))
      q.processAllAvailable()
      // each group's new mass shifts only ITS floor — retroactive
      // verdicts per language, exactly like a batch re-run
      assert(streamCurated() == mlBatchExpected(40L),
        s"horizon 2: ${streamCurated()} vs ${mlBatchExpected(40L)}")
    } finally q.stop()
  }
}
