package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Scale-state backends: the same streaming aggregate running on the
  * RocksDB state store provider (the disk-backed store used for large
  * keyed state on real clusters — reference analog: RocksDB-backed
  * WindowStore/KeyValueStore), plus streaming exact dedup with
  * watermark-bounded state. */
class StateBackendSpec extends SparkSpec {
  import spark.implicits._

  test("windowed avg runs correctly on the RocksDB state store provider") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Timestamp, Double)]
      val out = graft.operators.WindowedAverages
        .windowedAvgStream(in.toDF.toDF("ts", "value"), "ts", "value")
      val q = out.writeStream.format("memory").queryName("rocks_wavg")
        .outputMode(OutputMode.Update()).start()
      try {
        in.addData((new Timestamp(1000L), 10.0), (new Timestamp(2000L), 30.0))
        q.processAllAvailable()
        in.addData((new Timestamp(3000L), 20.0)) // same window, state reload
        q.processAllAvailable()
        val rows = spark.table("rocks_wavg")
          .select("win_key", "avg_total", "n").as[(String, Double, Long)]
          .collect().toList
        assert(rows.contains(("0-30000-0", 20.0, 3L)),
          s"expected merged window from RocksDB state, got $rows")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup drops within-watermark repeats, state stays bounded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = StreamingPipelines.dedupStream(
      in.toDF.toDF("id", "ts"), "ts", "60 seconds", Seq("id"))
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(("a", new Timestamp(1000L)), ("a", new Timestamp(2000L)),
        ("b", new Timestamp(3000L)))
      q.processAllAvailable()
      in.addData(("a", new Timestamp(4000L))) // still within watermark → dropped
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("id").as[String].collect().toList
      assert(ids.sorted == List("a", "b"))
    } finally q.stop()
  }
}
