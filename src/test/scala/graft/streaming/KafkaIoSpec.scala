package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The broker-free half of the Kafka edge (SURVEY.md S7): the serde
  * projections are pure column transforms over the Kafka source/sink
  * wire schema, so they are proven here against synthetic binary rows.
  * The connector itself cannot run in this container (no
  * spark-sql-kafka / broker jars offline — see README "Kafka I/O") and
  * the last test pins that limit as an executable fact: if the
  * connector ever appears on the classpath, the test fails and the
  * README note must flip to a real broker smoke spec.
  */
class KafkaIoSpec extends SparkSpec {
  import spark.implicits._

  test("decodeProjection: binary key/value → string pair + timestamp (Consumed.with(ByteArray, String))") {
    val wire = Seq(
      ("k1".getBytes("UTF-8"), "1500000000000,1,flux capacitor,19.99".getBytes("UTF-8"),
        new Timestamp(1500000000000L)),
      (null.asInstanceOf[Array[Byte]], "1500000001000,2,dynamo,5.0".getBytes("UTF-8"),
        new Timestamp(1500000001000L))
    ).toDF("key", "value", "timestamp")
    val out = KafkaIo.decodeProjection(wire)
      .as[(String, String, Timestamp)].collect()
    assert(out(0) == (("k1", "1500000000000,1,flux capacitor,19.99",
      new Timestamp(1500000000000L))))
    assert(out(1)._1 == null) // null keys pass through (byte-array serde)
    assert(out(1)._2 == "1500000001000,2,dynamo,5.0")
  }

  test("encodeProjection casts any castable pair to the string/string wire format") {
    val out = KafkaIo.encodeProjection(
        Seq((42L, 3.5d)).toDF("key", "value"))
      .as[(String, String)].collect()
    assert(out.head == (("42", "3.5")))
    assert(KafkaIo.encodeProjection(Seq(("a", "b")).toDF("key", "value"))
      .schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("key", "string"), ("value", "string")))
  }

  test("decode ∘ encode is the identity on string pairs plus a timestamp") {
    val src = Seq(("k", "v1,v2,v3")).toDF("key", "value")
    val roundtrip = KafkaIo.decodeProjection(
        KafkaIo.encodeProjection(src)
          .withColumn("timestamp", lit(new Timestamp(0L))))
      .select("key", "value")
      .as[(String, String)].collect()
    assert(roundtrip.head == (("k", "v1,v2,v3")))
  }

  test("container limit: the kafka connector is absent (README 'Kafka I/O' note)") {
    val e = intercept[Exception] {
      KafkaIo.readDelimited(spark, "localhost:9092", "orders")
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("kafka"),
      s"expected a missing-kafka-datasource error, got: ${e.getMessage}")
  }
}
