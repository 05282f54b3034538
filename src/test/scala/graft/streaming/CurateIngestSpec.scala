package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{BandStore, BloomStore, Dedup, TextAnalysis}
import graft.packs.TextOps

/** The complete curation ingest (relative floor read-time + mixture
  * emit-time + store-probed near-dup emit-time) against the batch
  * composition on a finalized horizon. Dup groups in the fixture are
  * cliques (mutually similar) and arrival order == id order, so the
  * stream's greedy first-arrival canonical equals the batch
  * clustering's min-id keep. The floor is retroactive read-time, so
  * the batch comparator applies it LAST (it never removes docs from
  * the dedup corpus — documented semantics). */
class CurateIngestSpec extends SparkSpec {
  import spark.implicits._

  private val KeepFrac = 0.6
  private val good = Seq.fill(8)("the quick brown fox is of a kind and").mkString(" ")
  private val dupBase = good + " gentle rivers flow across the quiet valley under pale light"

  test("stream curated view == batch mixture ∩ greedy-dedup ∩ floor per horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val floorStore = new QualityFloorStore(KeepFrac)
    val exactStore = new BloomStore(1000L)
    val bandStore = new BandStore("graft_band_store_curate", buckets = 2)
    val acceptedDocs = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF.toDF("doc_id", "lang", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val seen = acceptedDocs.toSeq.toDF("doc_id", "lang", "text")
        val out = StreamingPipelines.curateIngestBatch(floorStore,
            exactStore, bandStore,
            seen, batch, "doc_id", "text", "lang",
            TextOps.SampleRatesBp, TextOps.SampleDefaultBp,
            threshold = 0.5, batchId = batchId)
          .select(col("doc_id"), col("lang"), col("text"), col("quality_bp"))
          .as[(Long, String, String, Long)].collect()
        // foreachBatch runs on the stream-execution thread; the test
        // thread reads these buffers — guard both sides (JMM visibility)
        sunk.synchronized {
          acceptedDocs ++= out.map(r => (r._1, r._2, r._3))
          sunk ++= out.map(r => (r._1, r._4))
        }
        ()
      }.start()

    def streamCurated(): Set[Long] = {
      val sink = sunk.synchronized(sunk.toSeq).toDF("doc_id", "quality_bp")
      floorStore.curated(sink).select("doc_id").as[Long].collect().toSet
    }

    // all docs up to the horizon, in arrival (= id) order; a mix of
    // quality levels, a 3-clique of near-dups (ids 1, 2, 21 across two
    // batches), and junk that the floor should cut
    def textOf(i: Long): String = i match {
      case 1 | 2 | 21 => dupBase + s" variant$i"
      case i if i % 3 == 0 => good + s" marker $i"
      case i if i % 3 == 1 => s"plain words with the and of number $i mixed in shortish text"
      case _ => s"$i 88 12 99 ${i * 7} 3 4"
    }
    def docsUpTo(n: Long) = (1L to n).map(i => (i, "en", textOf(i)))

    def batchExpected(n: Long): Set[Long] = {
      val docs = docsUpTo(n).toDF("doc_id", "lang", "text")
      val mixed = TextAnalysis.stratifiedSample(docs, "lang", "doc_id",
        TextOps.SampleRatesBp, TextOps.SampleDefaultBp)
      val kept = Dedup.nearDupClustersFromPairs(mixed, "doc_id",
          Dedup.minhashLshMd5(mixed, "doc_id", "text", threshold = 0.5))
        .filter(col("keep")).select("doc_id")
      val floor = TextAnalysis.qualityFloor(docs, "doc_id", "text", KeepFrac)
        .select("doc_id")
      mixed.select("doc_id").join(kept, "doc_id").join(floor, "doc_id")
        .as[Long].collect().toSet
    }

    try {
      in.addData(docsUpTo(15L))
      q.processAllAvailable()
      assert(streamCurated() == batchExpected(15L),
        s"horizon 1: ${streamCurated()} vs ${batchExpected(15L)}")

      in.addData((16L to 30L).map(i => (i, "en", textOf(i))))
      q.processAllAvailable()
      // id 21 (near-dup of accepted 1/2) must have been dropped by the
      // store probe IF 1 or 2 passed the mixture gate; either way the
      // view equals the batch composition
      assert(streamCurated() == batchExpected(30L),
        s"horizon 2: ${streamCurated()} vs ${batchExpected(30L)}")
    } finally q.stop()
  }

  test("exact dups die at the native bloom gate; their bands never enter the band store") {
    val keepAll = Map("en" -> 10000)
    val floorStore = new QualityFloorStore(1.0)
    val exactStore = new BloomStore(1000L)
    val bandStore = new BandStore("graft_band_store_exactgate", buckets = 2)
    val t1 = good + " alpha beta gamma delta epsilon zeta eta theta"
    val t2 = good + " one two three four five six seven eight nine"
    val t3 = good + " fresh completely new sentence about rivers and stones"
    val seen0 = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    // threshold > 1 disables the near-dup gate entirely (jac ≤ 1): any
    // drop below can only come from the EXACT gate — proof the routing
    // is the bloom path, not banding catching a jac-1.0 pair
    val b1 = Seq((1L, "en", t1), (2L, "en", t2)).toDF("doc_id", "lang", "text")
    val out1 = StreamingPipelines.curateIngestBatch(floorStore, exactStore,
      bandStore, seen0, b1, "doc_id", "text", "lang", keepAll, 10000,
      threshold = 1.1, batchId = 0L)
    assert(out1.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

    val seen1 = Seq((1L, "en", t1), (2L, "en", t2)).toDF("doc_id", "lang", "text")
    // 50 = exact dup of accepted 1; 51/52 within-batch exact dups
    // (firsts keep the min id); 53 = exact dup of accepted 2
    val b2 = Seq((50L, "en", t1), (51L, "en", t3), (52L, "en", t3),
      (53L, "en", t2)).toDF("doc_id", "lang", "text")
    val out2 = StreamingPipelines.curateIngestBatch(floorStore, exactStore,
      bandStore, seen1, b2, "doc_id", "text", "lang", keepAll, 10000,
      threshold = 1.1, batchId = 1L)
    assert(out2.select("doc_id").as[Long].collect().toSet == Set(51L),
      "every exact dup must die at the bloom gate (banding is disabled here)")
    // the band store never ingested an exact dup's bands
    assert(bandStore.table(spark)
      .filter(col("doc_id").isin(50L, 52L, 53L)).count() == 0,
      "exact dups' bands must never reach the band store")
    assert(bandStore.table(spark).select("doc_id").distinct().count() == 3,
      "survivors' bands (1, 2, 51) must all be present")
    // plan pin: the routing gate is the native sharded bloom expression
    val probePlan = StreamingPipelines
      .exactGateBatch(exactStore, seen1, b2, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("graft_sharded_bloom_contains"),
      s"exact routing must be the native sharded bloom gate:\n$probePlan")
  }

  test("decontamination gate composes in FRONT: contaminated docs reach no store, not even the floor histogram") {
    import graft.operators.BenchmarkStore
    val keepAll = Map("en" -> 10000)
    val floorStore = new QualityFloorStore(1.0)
    val exactStore = new BloomStore(1000L)
    val bandStore = new BandStore("graft_band_store_decontam", buckets = 2)
    val benchStore = new BenchmarkStore("graft_bench_store_decontam")
    benchStore.ingest(
      Seq((100L, "held out evaluation prompt about unicorns and chess"))
        .toDF("doc_id", "text"), "text")
    val contaminated = good + " held out evaluation prompt about unicorns and chess"
    val cleanDoc = good + " fresh completely new sentence about rivers and stones"
    val batch = Seq((1L, "en", contaminated), (2L, "en", cleanDoc))
      .toDF("doc_id", "lang", "text")
    val seen0 = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    val gated = StreamingPipelines.decontaminateGateBatch(benchStore, batch,
      "doc_id", "text")
    val out = StreamingPipelines.curateIngestBatch(floorStore, exactStore,
      bandStore, seen0, gated, "doc_id", "text", "lang", keepAll, 10000,
      threshold = 1.1, batchId = 0L)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L),
      "the contaminated doc must die at the decontamination gate")
    // the absolute gate ran BEFORE the corpus-relative floor: the
    // histogram counted only the clean doc (a contaminated doc must
    // not shift the floor of a corpus it can never join)
    assert(floorStore.histogram(spark).agg(sum(col("c")))
      .collect()(0).getLong(0) == 1L,
      "floor histogram must count only decontaminated docs")
    assert(bandStore.table(spark).filter(col("doc_id") === 1L).count() == 0,
      "a contaminated doc's bands must never reach the band store")
  }
}
