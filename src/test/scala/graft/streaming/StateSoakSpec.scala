package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.IvfIndex

/** State-boundedness soak: the streaming dedup/serving operators driven
  * with thousands of documents across many micro-batches on the RocksDB
  * provider, asserting from `StreamingQueryProgress.stateOperators`
  * that stored state tracks the WATERMARK HORIZON, not total input —
  * the property that makes the streams runnable forever at ingest
  * scale. (The small-batch golden-trace specs prove semantics; this one
  * proves the memory story they assume.) */
class StateSoakSpec extends SparkSpec {
  import spark.implicits._

  test("neardup stream: 3000-doc soak on RocksDB — state rows plateau at the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Timestamp, String)]
      val q = NearDupStream
        .simhashNearDups(in.toDF.toDF("doc_id", "ts", "text"),
          "doc_id", "ts", "text", watermark = "60 seconds")
        .writeStream.outputMode("append")
        .format("memory").queryName("neardup_soak")
        .start()
      try {
        val batches = 30
        val perBatch = 100
        val stepSec = 10 // horizon = 60s → ~6-7 batches of docs live at once
        val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
        var id = 0L
        for (b <- 0 until batches) {
          val t = new Timestamp(b.toLong * stepSec * 1000L)
          val docs = (0 until perBatch).map { _ =>
            id += 1
            // varied modular vocabulary → spread fingerprints, so bucket
            // keys grow with the live doc set like a real corpus
            (id, t, s"word${id % 997} alpha${id % 313} beta${id % 101} " +
              s"gamma${id % 53} delta${id % 29} epsilon${id % 13} zeta${id % 7}")
          }
          in.addData(docs: _*)
          q.processAllAvailable()
          val p = q.lastProgress
          if (p != null && p.stateOperators.nonEmpty)
            stateRows += p.stateOperators.head.numRowsTotal
        }
        assert(stateRows.nonEmpty, "no state metrics reported")
        // past the first full horizon, guarded if progress reports lag
        val steady = stateRows(math.min(11, stateRows.size - 1))
        val fin = stateRows.last
        // Bounded by the horizon: ≤ Bands(4) buckets per live doc, with
        // ~700 docs live (6 trailing batches + the current one).
        val horizonCap = 4L * perBatch * 9 // generous: 9 batches' worth
        assert(fin <= horizonCap,
          s"state rows $fin exceed horizon bound $horizonCap (input was ${id} docs)")
        // NOT tracking total input: 3000 docs × 4 bands would be 12000.
        assert(fin < 4L * id / 2,
          s"state rows $fin track input volume, not the horizon")
        // Plateau: no monotone growth after the horizon fills.
        assert(fin <= steady * 13 / 10,
          s"state still growing: steady(batch 12)=$steady final=$fin trace=$stateRows")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("minhash neardup stream: 2000-doc soak — state plateaus at the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = NearDupStream
      .minhashNearDups(in.toDF.toDF("doc_id", "ts", "text"),
        "doc_id", "ts", "text", watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_mh_soak")
      .start()
    try {
      val batches = 20
      val perBatch = 100
      val stepSec = 10 // horizon = 60s → ~6-7 batches of docs live at once
      val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      var id = 0L
      for (b <- 0 until batches) {
        val t = new Timestamp(b.toLong * stepSec * 1000L)
        val docs = (0 until perBatch).map { _ =>
          id += 1
          (id, t, s"word${id % 997} alpha${id % 313} beta${id % 101} " +
            s"gamma${id % 53} delta${id % 29} epsilon${id % 13} zeta${id % 7}")
        }
        in.addData(docs: _*)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateRows += p.stateOperators.head.numRowsTotal
      }
      assert(stateRows.nonEmpty, "no state metrics reported")
      val steady = stateRows(math.min(8, stateRows.size - 1))
      val fin = stateRows.last
      // Bounded by the horizon: ≤ 8 band buckets per live doc, ~700 live.
      val horizonCap = 8L * perBatch * 9
      assert(fin <= horizonCap,
        s"state rows $fin exceed horizon bound $horizonCap (input was $id docs)")
      // NOT tracking total input: 2000 docs × 8 bands would be 16000.
      assert(fin < 8L * id / 2,
        s"state rows $fin track input volume, not the horizon")
      assert(fin <= steady * 13 / 10,
        s"state still growing: steady(batch 9)=$steady final=$fin trace=$stateRows")
    } finally q.stop()
  }

  test("ann serving: watermarked top-k state evicts served queries (horizon, not total)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val centroids = IvfIndex.train(corpus, nlist = 4, iters = 2)
    val in = MemoryStream[(Long, Timestamp, Seq[Float])]
    val q = AnnServeStream
      .ivfTopKStream(corpus, in.toDF.toDF("query_id", "ts", "q_emb"), centroids,
        k = 3, nprobe = 2, tsCol = Some("ts"), watermark = "60 seconds")
      .writeStream.outputMode("update")
      .format("memory").queryName("ann_soak_out")
      .start()
    try {
      val batches = 12
      val perBatch = 50
      val stepSec = 30 // horizon 60s → ~3 batches of query state live
      val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (b <- 0 until batches) {
        val t = new Timestamp(b.toLong * stepSec * 1000L)
        in.addData((0 until perBatch).map(i =>
          (b * 100L + i, t, Seq.fill(16)(rnd.nextGaussian().toFloat))): _*)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateRows += p.stateOperators.head.numRowsTotal
      }
      // This soak is what caught the unbounded form: without tsCol the
      // aggregate keys on query_id alone and numRowsTotal reaches
      // batches×perBatch (600). Watermark-keyed, state holds only the
      // queries inside the horizon.
      val fin = stateRows.last
      assert(fin <= 4L * perBatch,
        s"served-query state not evicted: $fin rows, trace=$stateRows")
      assert(spark.table("ann_soak_out").count() > 0)
    } finally q.stop()
  }

  test("as-of stream: 25-batch soak — every trade answers once, state memory plateaus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import AsOfStream.AsOfEvent
    val in = MemoryStream[AsOfEvent]
    val q = AsOfStream.asOf(in.toDS(), "20 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_soak")
      .start()
    try {
      val batches = 25
      val keys = 50
      val stepSec = 10 // horizon 20 s → ~2 batches of quotes live per key
      val base = 1000L // epoch-0 rows collide with the INITIAL watermark
                       // (ts = 0 = wm drops as late) — start past it
      val rowsTrace = scala.collection.mutable.ArrayBuffer.empty[Long]
      val memTrace = scala.collection.mutable.ArrayBuffer.empty[Long]
      var trades = 0L
      for (b <- 0 until batches) {
        val t = base + b.toLong * stepSec
        val events = (0 until keys).flatMap { k =>
          Seq(
            AsOfEvent(k, new Timestamp(t * 1000), isQuote = true, b * 1.0 + k, 0L),
            AsOfEvent(k, new Timestamp(t * 1000 + 500), isQuote = false, 0.0,
              b.toLong * keys + k))
        }
        trades += keys
        in.addData(events: _*)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          rowsTrace += p.stateOperators.head.numRowsTotal
          memTrace += p.stateOperators.head.memoryUsedBytes
        }
      }
      // one GroupState row per key — never per trade or per quote
      assert(rowsTrace.last <= keys,
        s"state rows ${rowsTrace.last} exceed key count $keys: $rowsTrace")
      // per-key payload is horizon-bounded: quotes at-or-below the
      // watermark fold into ONE row, so memory plateaus instead of
      // accumulating 25 batches of quotes
      val steady = memTrace(math.min(6, memTrace.size - 1))
      assert(memTrace.last <= steady * 15 / 10,
        s"as-of state memory still growing: steady=$steady final=${memTrace.last}")
      // exactness under soak: every trade the watermark passed answered
      // exactly once, with the same-timestamp quote (quote@t <= trade@t+0.5s)
      val out = spark.table("asof_soak")
        .as[(Long, Long, Long, Option[Double], Option[Long])].collect()
      assert(out.map(_._2).distinct.length == out.length, "duplicate answers")
      // watermark after the last batch passed all but the final ~2 batches
      assert(out.length >= trades - 3L * keys,
        s"only ${out.length} of $trades trades answered")
      out.foreach { r =>
        val k = r._1; val tradeMs = r._3
        val b = ((tradeMs - 500) / 1000 - base) / stepSec
        assert(r._4.contains(b * 1.0 + k),
          s"trade ${r._2} answered ${r._4}, expected quote of its own batch ($b)")
      }
    } finally q.stop()
  }
}
