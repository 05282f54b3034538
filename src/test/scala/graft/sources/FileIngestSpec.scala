package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The full file path of the Aggregations topology: delimited text files
  * → file-watch streaming source → FAILFAST decode → windowed averages —
  * same transform as the Kafka/MemoryStream paths. */
class FileIngestSpec extends SparkSpec {
  import spark.implicits._

  test("batch file read decodes orders CSV") {
    val dir = Files.createTempDirectory("graft_orders").toFile
    Files.writeString(new java.io.File(dir, "part1.csv").toPath,
      "0,1,apples,10.0\n10000,2,bananas,20.0\n")
    val df = FileIngest.readDelimitedFiles(spark, dir.getAbsolutePath,
      DelimitedCodec.orderSchema)
    val rows = df.as[graft.model.OrderData].collect().sortBy(_.orderId)
    assert(rows.length == 2)
    assert(rows(0) == graft.model.OrderData(0L, 1, "apples", 10.0))
  }

  test("streaming file source drives the windowed-avg topology end to end") {
    val dir = Files.createTempDirectory("graft_orders_stream").toFile
    Files.writeString(new java.io.File(dir, "batch1.csv").toPath,
      "0,1,apples,10.0\n10000,2,bananas,20.0\n30000,3,cherries,40.0\n")
    val lines = spark.readStream
      .text(dir.getAbsolutePath)
      .selectExpr("CAST(value AS STRING) AS value")
    val out = graft.streaming.StreamingPipelines.ordersToAverages(lines)
    val q = out.writeStream.format("memory").queryName("favg")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("favg").as[(String, String)].collect().toMap
      assert(rows("0-30000-0") == "30.0,15.0")
      assert(rows("30000-60000-0") == "80.0,40.0")
    } finally q.stop()
  }
}
