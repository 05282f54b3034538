package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies real multilingual snippets") {
    val docs = Seq(
      ("the cat is in the house and a dog", "en"),
      ("der hund ist ein tier und die katze", "de"),
      ("le chat est un animal et la maison", "fr"),
      ("el gato y los perros es para las casas", "es"),
      ("这是 一个 中文 文档", "zh")
    ).toDF("text", "expected")
    val out = docs.select(col("expected"),
      TextAnalysis.langId(col("text")).as("got"))
      .as[(String, String)].collect()
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("rolling fingerprint: matches hand fold, ignores non-ascii, empty→0") {
    val docs = Seq("hello world", "héllo world", "世界").toDF("text")
    val out = docs.select(TextAnalysis.rollingFingerprint(col("text")))
      .as[Long].collect()
    var acc = 0L
    "hello world".foreach(c => acc = (acc * 31 + c.toLong) % 1000000007L)
    assert(out(0) == acc)
    var acc2 = 0L
    "hllo world".foreach(c => acc2 = (acc2 * 31 + c.toLong) % 1000000007L)
    assert(out(1) == acc2) // é stripped
    assert(out(2) == 0L)   // all non-ascii → empty → 0
  }

  test("textStats counts tokens/punct/digits exactly") {
    val out = TextAnalysis.textStats(
      Seq((1L, "ab cd, 12!")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("n_chars") == 10L)
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[Double]("punct_ratio") == 0.2) // ',' and '!'
    assert(out.getAs[Double]("digit_ratio") == 0.2)
  }

  test("tokenCounts: ws vs word-regex vs bpe estimate") {
    val out = TextAnalysis.tokenCounts(
      Seq((1L, "spark is fast42 ok")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("ws_tokens") == 4L)
    assert(out.getAs[Long]("word_tokens") == 4L) // [a-z0-9]+ matches fast42 as one
    assert(out.getAs[Long]("bpe_est") == 5L)     // ceil(18/4)
  }

  test("normalizeText lowercases, strips punct, collapses whitespace") {
    val out = Seq("  Hello,   WORLD!! it's 42. ").toDF("t")
      .select(TextAnalysis.normalizeText(col("t"))).as[String].collect().head
    assert(out == "hello world it s 42")
  }

  test("frame sampling and resize metadata plumbing") {
    val row = Seq((10000L, 1920, 1080)).toDF("dur", "w", "h")
      .select(
        Multimodal.frameOffsetsMs(col("dur"), 4).as("offs"),
        Multimodal.resizeMeta(col("w"), col("h"), 640).as("rm"))
      .collect().head
    assert(row.getSeq[Long](0) == Seq(0L, 2500L, 5000L, 7500L))
    val rm = row.getStruct(1)
    assert(rm.getAs[Int]("target_width") == 640)
    assert(rm.getAs[Int]("target_height") == 360)
  }

  test("multimodal featurize: deterministic fake decode, schema intact") {
    val docs = Seq((1L, "hello"), (2L, "world"), (3L, "hello")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val assets = Multimodal.syntheticAssets(spark, docs)
    val feats = Multimodal.featurize(spark, assets).collect()
    assert(feats.length == 3)
    val byId = feats.map(f => f.asset_id -> f).toMap
    assert(byId(1L).n_bytes == 5L)
    assert(byId(1L).embedding.length == 8)
    // determinism: same bytes → same fingerprint/embedding, diff bytes → diff
    val f1b = Multimodal.featurize(spark, assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(byId(1L).fingerprint == f1b(1L).fingerprint)
    assert(byId(1L).embedding.toSeq == f1b(1L).embedding.toSeq)
    assert(byId(1L).fingerprint != byId(2L).fingerprint)
  }
}
