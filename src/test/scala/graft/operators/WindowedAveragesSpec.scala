package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowedAveragesSpec extends SparkSpec {
  import spark.implicits._

  // Rows straddling one 30 s window boundary at epoch+30 s.
  private def input = Seq(
    (new Timestamp(0L), 10.0),      // window [0, 30000)
    (new Timestamp(10000L), 20.0),  // window [0, 30000)
    (new Timestamp(29999L), 30.0),  // window [0, 30000)
    (new Timestamp(30000L), 40.0)   // window [30000, 60000)
  ).toDF("ts", "value")

  test("tumbling 30s window: avg(v*2), avg(v), count; reference key format") {
    val out = WindowedAverages.windowedAvg(input, "ts", "value")
      .orderBy("window_start_ms")
      .collect()

    assert(out.length == 2)
    val w0 = out(0)
    assert(w0.getAs[String]("win_key") == "0-30000-0")
    assert(w0.getAs[Double]("avg_total_x2") == 40.0) // avg(20,40,60)
    assert(w0.getAs[Double]("avg_total") == 20.0)    // avg(10,20,30)
    assert(w0.getAs[Long]("n") == 3L)

    val w1 = out(1)
    assert(w1.getAs[String]("win_key") == "30000-60000-0")
    assert(w1.getAs[Double]("avg_total_x2") == 80.0)
    assert(w1.getAs[Double]("avg_total") == 40.0)
    assert(w1.getAs[Long]("n") == 1L)
  }

  test("windowed_avg query runs on testdata and covers every event") {
    val df = graft.packs.ReferencePipelines.windowedAvg(spark, sf)
    val total = df.agg(sum("n")).as[Long].head()
    val events = graft.Tables.events(spark, sf).count()
    assert(total == events)
  }
}
