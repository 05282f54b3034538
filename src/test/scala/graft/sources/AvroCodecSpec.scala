package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The Avro wire codec: exact binary layout (hand-computed against the
  * Avro spec's zigzag-varint/length-prefix encoding), roundtrip on both
  * reference schemas, and unicode safety. */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  test("binary layout matches the Avro spec (hand-computed bytes)") {
    // record {impresssiontime=1, "ab", "c", "d"} encodes as:
    //   long 1  -> zigzag(1)=2          -> 0x02
    //   "ab"    -> len zigzag(2)=4, 'a','b' -> 0x04 0x61 0x62
    //   "c"     -> 0x02 0x63
    //   "d"     -> 0x02 0x64
    val df = Seq((1L, "ab", "c", "d"))
      .toDF("impresssiontime", "impressionid", "userid", "adid")
    val bytes = AvroCodec.encode(df, AvroCodec.ImpressionSchemaJson)
      .head().getAs[Array[Byte]](0)
    assert(bytes.toSeq == Seq(0x02, 0x04, 0x61, 0x62, 0x02, 0x63, 0x02, 0x64)
      .map(_.toByte), s"got ${bytes.map(b => f"0x$b%02x").mkString(",")}")
    // negative long: zigzag(-1)=1
    val neg = Seq((-1L, "", "", ""))
      .toDF("impresssiontime", "impressionid", "userid", "adid")
    val nb = AvroCodec.encode(neg, AvroCodec.ImpressionSchemaJson)
      .head().getAs[Array[Byte]](0)
    assert(nb.toSeq == Seq(0x01, 0x00, 0x00, 0x00).map(_.toByte))
  }

  test("roundtrip on both reference schemas, unicode included") {
    val imps = Seq((42L, "impression_1", "user_ü", "ad_中文"),
        (Long.MaxValue, "", "u", "a"))
      .toDF("impresssiontime", "impressionid", "userid", "adid")
    val backI = AvroCodec.decode(
      AvroCodec.encode(imps, AvroCodec.ImpressionSchemaJson),
      "value", AvroCodec.ImpressionSchemaJson)
    assert(backI.as[(Long, String, String, String)].collect().toSet ==
      imps.as[(Long, String, String, String)].collect().toSet)

    val clks = Seq((7L, "user_1", "impression_9", "ad_3", "click_5"))
      .toDF("clicktime", "userid", "impressionid", "adid", "clickid")
    val backC = AvroCodec.decode(
      AvroCodec.encode(clks, AvroCodec.ClickSchemaJson),
      "value", AvroCodec.ClickSchemaJson)
    assert(backC.as[(Long, String, String, String, String)].collect().toSeq ==
      clks.as[(Long, String, String, String, String)].collect().toSeq)
  }

  test("fixture roundtrip at sf0.001 is the identity") {
    val imp = graft.sources.AdFixtures.impressions(spark, sf)
    val back = graft.packs.ReferencePipelines.avroRoundtrip(spark, sf)
    assert(back.as[(Long, String, String, String)].collect().toSet ==
      imp.as[(Long, String, String, String)].collect().toSet)
    assert(back.count() == Tables.events(spark, sf).count())
  }
}
