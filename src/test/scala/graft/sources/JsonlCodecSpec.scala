package graft.sources

import org.apache.spark.SparkException
import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonlCodecSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("score", DoubleType)))

  test("round trip preserves escapes, unicode, and nulls") {
    val rows = Seq(
      (1L, "plain words", 0.5),
      (2L, "quotes \" and \\ backslash and\nnewline and \ttab", 1.0),
      (3L, "unicode: 中文 και ру́сский émojis 😀", -0.25),
      (4L, null.asInstanceOf[String], 0.0))
    val df = rows.toDF("id", "text", "score")
    val back = JsonlCodec.decoded(JsonlCodec.encoded(df), "line", schema)
      .as[(Long, String, Double)].collect().toSet
    assert(back == rows.toSet)
  }

  test("FAILFAST throws on malformed lines; PERMISSIVE null-fills them") {
    val bad = Seq("{\"id\": 1, \"text\": \"ok\", \"score\": 0.1}", "{not json")
      .toDF("line")
    intercept[SparkException] {
      JsonlCodec.decoded(bad, "line", schema).collect()
    }
    val perm = JsonlCodec.decoded(bad, "line", schema, failfast = false)
      .as[(Option[Long], Option[String], Option[Double])].collect()
    assert(perm.length == 2)
    assert(perm.contains((Some(1L), Some("ok"), Some(0.1))))
    assert(perm.contains((None, None, None)), "malformed row must null-fill")
  }

  test("schema pruning: projecting one field prunes the parse") {
    val df = Seq((1L, "a", 0.1)).toDF("id", "text", "score")
    val plan = JsonlCodec.decoded(JsonlCodec.encoded(df), "line", schema)
      .select("id").queryExecution.optimizedPlan.toString
    assert(!plan.contains("score"),
      s"unprojected fields must be pruned from from_json:\n$plan")
  }
}
