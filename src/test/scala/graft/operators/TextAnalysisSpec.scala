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

  test("stratified sample: deterministic, partition-independent, rates honored") {
    val d = graft.Tables.documents(spark, sf)
    val rates = Map("en" -> 5000, "zh" -> 10000)
    val out1 = TextAnalysis.stratifiedSample(d, "lang", "doc_id", rates, 2500)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val out2 = TextAnalysis.stratifiedSample(d.repartition(7), "lang", "doc_id", rates, 2500)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out1 == out2, "keep set must not depend on partitioning")
    val byLang = TextAnalysis.stratifiedSample(d, "lang", "doc_id", rates, 2500)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("zh") == total("zh"), "rate 10000bp keeps every row")
    val enRatio = byLang("en").toDouble / total("en")
    assert(enRatio > 0.3 && enRatio < 0.7, s"en ratio $enRatio far from 0.5")
    val deRatio = byLang.getOrElse("de", 0L).toDouble / total("de")
    assert(deRatio < enRatio, s"de ($deRatio) must be thinned below en ($enRatio)")
  }

  test("temperature sample: rates computed from counts, rare sources boosted") {
    val d = graft.Tables.documents(spark, sf)
    val target = 150L
    val out = TextAnalysis.temperatureSample(d, "source", "doc_id", target)
    // deterministic and partition-independent, like every md5 gate
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = TextAnalysis.temperatureSample(d.repartition(7), "source",
      "doc_id", target).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2, "keep set must not depend on partitioning")
    // rate_bp reproduces the closed form for every source, capped at 1.0
    val n = d.groupBy("source").count().as[(String, Long)].collect().toMap
    val sumSqrt = n.values.map(v => BigDecimal(math.sqrt(v.toDouble))
      .setScale(15, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val rates = out.select("source", "rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    rates.foreach { case (s, bp) =>
      val expect = math.min(10000L,
        math.floor(10000.0 * target / (sumSqrt * math.sqrt(n(s).toDouble))).toLong)
      assert(bp == expect, s"source $s: rate $bp != closed-form $expect")
    }
    // the driver fixture is source-uniform, so the flattening property
    // needs a skewed corpus: 400 docs of one source vs 16 of another —
    // the rare source's per-doc keep rate must be strictly higher, and
    // a tiny-enough source pins at the 10000 bp cap (keep everything)
    val skewed = spark.range(0, 400).select(col("id").as("doc_id"), lit("big").as("src"))
      .union(spark.range(1000, 1016).select(col("id").as("doc_id"), lit("small").as("src")))
      .union(spark.range(2000, 2002).select(col("id").as("doc_id"), lit("tiny").as("src")))
    val skewedRates = TextAnalysis.temperatureSample(skewed, "src", "doc_id", 60L)
      .select("src", "rate_bp").distinct().as[(String, Long)].collect().toMap
    assert(skewedRates("small") > skewedRates("big"),
      s"rare source must be boosted: $skewedRates")
    assert(skewedRates("tiny") == 10000L,
      s"tiny source must cap at keep-everything: $skewedRates")
  }

  test("quality floor: top-frac kept, boundary ties included, deterministic") {
    val d = graft.Tables.documents(spark, sf)
    val out1 = TextAnalysis.qualityFloor(d, "doc_id", "text", 0.6)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val out2 = TextAnalysis.qualityFloor(d.repartition(7), "doc_id", "text", 0.6)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out1 == out2, "keep set must not depend on partitioning")
    val n = d.count()
    // at least the requested fraction survives; ties may push it higher
    assert(out1.size >= math.ceil(n * 0.6).toLong, s"${out1.size} of $n kept")
    // value-based floor: every kept score >= every dropped score
    val cutoff = out1.map(_._2).min
    val all = d.select(col("doc_id"),
        round(TextAnalysis.qualityExpr(col("text")) * 10000).cast("long"))
      .as[(Long, Long)].collect()
    val dropped = all.filterNot(r => out1.exists(_._1 == r._1))
    assert(dropped.forall(_._2 < cutoff),
      "no dropped doc may score at or above the cutoff")
    // boundary ties: every doc AT the cutoff value is kept
    assert(all.filter(_._2 == cutoff).map(_._1).toSet
      .subsetOf(out1.map(_._1).toSet))
  }

  test("per-group quality floor == global floor run on each group's slice") {
    val d = graft.Tables.documents(spark, sf)
    val grouped = TextAnalysis
      .qualityFloorByGroup(d, "doc_id", "text", "lang", 0.6)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // the grouped floor must be EXACTLY the global floor applied to
    // each language's slice alone — one arithmetic, no drift
    val perLang = d.select("lang").distinct().as[String].collect().flatMap {
      l =>
        TextAnalysis.qualityFloor(d.filter(col("lang") === l),
            "doc_id", "text", 0.6)
          .as[(Long, Long)].collect().map { case (id, bp) => (id, l, bp) }
    }.sortBy(_._1).toSeq
    assert(grouped == perLang)
    // keep set must not depend on partitioning
    val again = TextAnalysis
      .qualityFloorByGroup(d.repartition(7), "doc_id", "text", "lang", 0.6)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(grouped == again)
  }

  test("tfidf: corpus-wide words rank below doc-specific words, k bounded") {
    val d = Seq(
      (1L, "shared shared apple apple apple"),
      (2L, "shared banana"),
      (3L, "shared cherry cherry")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .as[(Long, String, Double, Long)].collect() // doc_id, term, score, rk
      .map(r => (r._1, r._4) -> r._2).toMap
    // 'shared' appears in every doc (df=3, idf minimal) — never rank 1
    assert(out(1L, 1L) == "apple" && out(2L, 1L) == "banana" && out(3L, 1L) == "cherry")
    assert(out(1L, 2L) == "shared" && out(2L, 2L) == "shared")
    assert(out.keys.forall(_._2 <= 2))
  }

  test("repetition stats: degenerate docs flagged, varied docs pass, tiny docs safe") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam ok"),   // unigram-degenerate
      (2L, "ab cd ab cd ab cd ab cd ab cd"),                      // bigram-degenerate
      (3L, "each word here appears exactly once in this doc"),    // clean
      (4L, "solo")                                                // < 2 tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(d, "doc_id", "text")
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 0.9 && out(1L)._4, s"got ${out(1L)}")
    assert(out(2L)._3 > 0.18 && out(2L)._4, s"got ${out(2L)}")
    assert(!out(3L)._4, s"clean doc flagged: ${out(3L)}")
    assert(out(4L)._2 == 1.0 && out(4L)._3 == 0.0, s"got ${out(4L)}")
  }

  test("vocab heavy-hitters: frequency order, doc_freq <= occurrences, top-k plan") {
    val d = Seq(
      (1L, "common common common rare"),
      (2L, "common mid mid"),
      (3L, "common mid other")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabTopTerms(d, "doc_id", "text", n = 3)
      .as[(String, Long, Long)].collect()
    assert(out(0) == ("common", 5L, 3L) && out(1) == ("mid", 3L, 2L))
    // third place: the 1-occurrence tie ("other" vs "rare") breaks by term
    assert(out(2) == ("other", 1L, 1L))
    assert(out.forall(r => r._3 <= r._2))
    val p = TextAnalysis.vocabTopTerms(
        graft.Tables.documents(spark, sf), "doc_id", "text", 100)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k heap plan:\n$p")
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

  test("pii redaction: emails and phones scrubbed to placeholders, counts audited") {
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or 555-867-5309 x12"),
      (2L, "call 123 456 7890 then 987.654.3210 thanks"),
      (3L, "clean text with no personal data at all")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == "contact me at <EMAIL> or <PHONE> x12")
    assert(out(1L)._2 == 2L)
    assert(out(2L)._1 == "call <PHONE> then <PHONE> thanks")
    assert(out(2L)._2 == 2L)
    assert(out(3L) == ("clean text with no personal data at all", 0L))
  }

  test("pii full family: ip and card redacted, per-type counts independent") {
    val docs = Seq(
      (1L, "server 192.168.0.1 billed card 4111-1111-1111-1111 via a@b.io"),
      (2L, "version 1.2.3 is fine but 10.0.0.255 leaks"),
      (3L, "digits 4111111111111111 run together still redact"),
      (4L, "clean text entirely")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPiiFull(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "server <IP> billed card <CARD> via <EMAIL>")
    assert((out(1L)._3, out(1L)._4, out(1L)._5, out(1L)._6) == ((1L, 0L, 1L, 1L)))
    // the naive dotted-quad pattern matches "1.2.3"? no — four groups
    // required; "10.0.0.255" matches (documented recall-over-precision)
    assert(out(2L)._5 == 1L, s"one dotted quad expected: ${out(2L)}")
    assert(out(3L)._6 == 1L && out(3L)._2.contains("<CARD>"))
    assert(out(4L)._2 == "clean text entirely" &&
      (out(4L)._3 | out(4L)._4 | out(4L)._5 | out(4L)._6) == 0L)
  }

  test("redact by source: rollup attributes pii mass to its source") {
    val docs = Seq(
      (1L, "mail a@b.io and c@d.io today", "web"),
      (2L, "ip 8.8.8.8 noted", "web"),
      (3L, "all clean here", "books"),
      (4L, "also clean prose", "books")).toDF("doc_id", "text", "source")
    val out = TextAnalysis
      .redactRateBySource(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("web") == (("web", 2L, 2L, 0L, 1L, 0L, 2L)), s"${out("web")}")
    assert(out("books") == (("books", 2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("redact spans: abutting pii tokens merge to one island; strip rebuilds") {
    // tokens 2,3 are PII and adjacent → ONE span of 2; token 7 alone
    val docs = Seq(
      (1L, "send to a@b.io 10.0.0.1 right away or 555-123-4567 maybe"),
      (2L, "wholly clean document")).toDF("doc_id", "text")
    val spans = TextAnalysis.redactSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(spans == Seq((1L, 2L, 2L), (1L, 7L, 1L)), s"got $spans")
    val stripped = TextAnalysis.redactStripSpans(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(stripped(1L) == ("send to right away or maybe", 3L))
    assert(stripped(2L) == ("wholly clean document", 0L))
  }

  test("decontamination: benchmark-overlapping docs flagged with exact shingle counts") {
    val bench = Seq((100L, "the capital of france is paris obviously")).toDF("doc_id", "text")
    val docs = Seq(
      // contains the benchmark 5-shingle run "capital of france is paris"
      (1L, "quiz answer the capital of france is paris end"),
      (2L, "unrelated text about distributed query planning today"),
      (3L, "tiny")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(docs, bench, "doc_id", "text")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // shared 3-shingles: "the capital of", "capital of france",
    // "of france is", "france is paris" = 4
    assert(out(1L) == (4L, true), s"got ${out(1L)}")
    assert(out(2L) == (0L, false))
    assert(out(3L) == (0L, false)) // sub-n docs can't overlap
  }

  test("per-source cap: exactly k kept per big source, small sources whole, deterministic") {
    val docs = ((1L to 30L).map(i => (i, s"text $i", "big")) ++
      (31L to 33L).map(i => (i, s"text $i", "small")))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.perSourceCap(docs, "source", "doc_id", k = 5)
      .as[(Long, String, Long)].collect()
    val bySource = out.groupBy(_._2)
    assert(bySource("big").length == 5)
    assert(bySource("small").map(_._1).toSet == Set(31L, 32L, 33L))
    assert(out.forall(_._3 <= 5))
    // deterministic: same keep set on re-run and after repartition
    val out2 = TextAnalysis.perSourceCap(docs.repartition(7), "source", "doc_id", k = 5)
      .as[(Long, String, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == out2.map(r => (r._1, r._2)).toSet)
    // hash priority, not lowest-ids-win: the big-source keep set must
    // not simply be ids 1-5
    assert(bySource("big").map(_._1).toSet != (1L to 5L).toSet)
  }

  test("real decode: ImageIO round-trips the synthesized PNGs exactly") {
    val docs = Seq((5L, "x"), (17L, "y"), (40L, "z")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeImages(spark,
      Multimodal.syntheticPngAssets(spark, docs)).collect()
      .map(d => d.asset_id -> d).toMap
    assert(decoded.keySet == Set(5L, 17L, 40L))
    decoded.foreach { case (id, d) =>
      // dims from the shared formula
      assert(d.width == (4 + id % 13).toInt && d.height == (3 + id % 7).toInt)
      // hash recomputed from the pixel formula, independent of ImageIO
      var h = -1L
      for (y <- 0 until d.height; x <- 0 until d.width;
           c <- Seq((id * 31 + x * 7 + y * 13) % 256,
             (id * 17 + x * 3 + y * 5) % 256,
             (id * 29 + x * 11 + y * 3) % 256))
        h = if (h < 0) c else (31 * h + c) % 1000000007L
      assert(d.pixel_hash == h, s"asset $id: decode did not invert the encode")
    }
  }

  test("resizeImages: identity dims reproduce the decode fold; NN map exact") {
    val docs = Seq((5L, "x"), (17L, "y"), (40L, "z")).toDF("doc_id", "text")
    val assets = Multimodal.syntheticPngAssets(spark, docs)
    // identity resize: out dims == each asset's own dims → the
    // nearest-neighbor map is the identity and the fold must equal
    // decodeImages' pixel_hash exactly
    val decoded = Multimodal.decodeImages(spark, assets).collect()
      .map(d => d.asset_id -> d).toMap
    decoded.foreach { case (id, d) =>
      val one = assets.filter(_.asset_id == id)
      val r = Multimodal.resizeImages(spark, one, d.width, d.height)
        .collect().head
      assert(r.pixel_hash == d.pixel_hash,
        s"asset $id: identity resize must reproduce the decode fold")
    }
    // fixed-geometry resize: hash recomputed from the pixel formula
    // THROUGH the index map, independent of ImageIO
    val resized = Multimodal.resizeImages(spark, assets).collect()
      .map(r => r.asset_id -> r).toMap
    resized.foreach { case (id, r) =>
      assert(r.out_w == Multimodal.ResizeOutW && r.out_h == Multimodal.ResizeOutH)
      val (w, h) = (r.src_w.toLong, r.src_h.toLong)
      var acc = -1L
      for (y <- 0 until r.out_h; x <- 0 until r.out_w) {
        val sx = x * w / r.out_w; val sy = y * h / r.out_h
        for (c <- Seq((id * 31 + sx * 7 + sy * 13) % 256,
          (id * 17 + sx * 3 + sy * 5) % 256,
          (id * 29 + sx * 11 + sy * 3) % 256))
          acc = if (acc < 0) c else (31 * acc + c) % 1000000007L
      }
      assert(r.pixel_hash == acc, s"asset $id: resize sampling drifted")
    }
  }

  test("real decode: RealDecoder features for PNG bytes; WAV PCM; video seam throws") {
    // image through the full MediaDecoder seam
    val docs = Seq((9L, "img")).toDF("doc_id", "text")
    val asset = Multimodal.syntheticPngAssets(spark, docs).collect().head
    val feats = Multimodal.RealDecoder.decode(asset)
    assert(feats.n_bytes == asset.bytes.length.toLong)
    assert(feats.embedding.length == 8 && feats.embedding.forall(v => v >= 0f && v <= 1f))
    // WAV: synthesize 16-bit mono PCM, decode, check the sample fold
    val samples = Array.tabulate(64)(i => ((9L * 31 + i * 7) % 65536 - 32768).toShort)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = Multimodal.MediaAsset(7L, "audio", bos.toByteArray,
      Multimodal.MediaMeta(0, 0, 16000, 4L))
    val af = Multimodal.RealDecoder.decode(wav)
    var expect = -1L
    samples.foreach { s =>
      val u = (s & 0xffff).toLong
      expect = if (expect < 0) u else (31 * expect + u) % 1000000007L
    }
    assert(af.fingerprint == expect, "WAV decode must recover the exact PCM samples")
    intercept[UnsupportedOperationException] {
      Multimodal.RealDecoder.decode(wav.copy(kind = "video"))
    }
  }

  test("real decode: multi-frame GIF round-trips the synthesized frames exactly") {
    import Multimodal._
    // ids ≡ 2 (mod 3) exercise 1..4 distinct frame counts
    val docs = Seq((2L, "a"), (5L, "b"), (17L, "c"), (38L, "d")).toDF("doc_id", "text")
    val rows = Multimodal.decodeVideoFrames(spark,
      Multimodal.syntheticGifAssets(spark, docs)).collect()
    assert(rows.map(_.asset_id).toSet == Set(2L, 5L, 17L, 38L))
    assert(rows.length == 4 * FrameSamples)
    rows.foreach { r =>
      val id = r.asset_id
      assert(r.width == (GifWBase + id % GifWMod).toInt &&
        r.height == (GifHBase + id % GifHMod).toInt &&
        r.n_frames == (GifFBase + id % GifFMod).toInt)
      assert(r.duration_ms == r.n_frames * GifMsPerFrame)
      assert(r.offset_ms == r.frame_idx * r.duration_ms / FrameSamples)
      assert(r.sampled_frame ==
        math.min(r.n_frames - 1, (r.offset_ms / GifMsPerFrame).toInt))
      // hash recomputed from the pixel formula, independent of ImageIO
      var h = -1L
      for (y <- 0 until r.height; x <- 0 until r.width; _ <- 0 until 3) {
        val c = (id * GifPixMul._1 + x * GifPixMul._2 + y * GifPixMul._3 +
          r.sampled_frame * GifPixMul._4) % 256
        h = if (h < 0) c else (31 * h + c) % 1000000007L
      }
      assert(r.pixel_hash == h,
        s"asset $id frame ${r.sampled_frame}: GIF decode did not invert the encode")
    }
  }

  test("gifFrames rejects transparency-composed frames (fail-don't-garble)") {
    // re-encode a 2-frame gray GIF but mark frames transparent: the
    // uncomposed decode would fingerprint pixels no viewer sees, so the
    // guard must throw instead — including for frame 0 (it composes
    // over the background)
    def grayFrame(v: Int): java.awt.image.BufferedImage = {
      val cmap = Array.tabulate(256)(i => (0xff000000 | (i << 16) | (i << 8) | i))
      val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, 0,
        java.awt.image.DataBuffer.TYPE_BYTE)
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 4; x <- 0 until 4) img.getRaster.setSample(x, y, 0, v)
      img
    }
    def encodeTransparent(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { img =>
          val meta = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
          val fmt = meta.getNativeMetadataFormatName
          val root = meta.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = {
            val nodes = root.getElementsByTagName("GraphicControlExtension")
            if (nodes.getLength > 0)
              nodes.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            else {
              val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
              root.appendChild(n); n
            }
          }
          gce.setAttribute("disposalMethod", "doNotDispose")
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "TRUE")
          gce.setAttribute("transparentColorIndex", "0")
          gce.setAttribute("delayTime", "10")
          meta.setFromTree(fmt, root)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    val bytes = encodeTransparent(Seq(grayFrame(10), grayFrame(200)))
    val e = intercept[IllegalArgumentException] {
      Multimodal.RealDecoder.gifFrames(bytes)
    }
    assert(e.getMessage.contains("transparency"), e.getMessage)
    // and the opaque encode still round-trips (no false rejection)
    val ok = Multimodal.RealDecoder.gifFrames(
      Multimodal.encodeGif(Seq(grayFrame(10), grayFrame(200))))
    assert(ok.length == 2)
  }

  test("decodeVideoFrames offsets match the declarative frameOffsetsMs plan") {
    val durations = Seq((1L, 200L), (2L, 300L), (3L, 500L)).toDF("id", "duration_ms")
    val planned = durations.select(col("id"),
        posexplode(Multimodal.frameOffsetsMs(col("duration_ms"),
          Multimodal.FrameSamples)))
      .select(col("id"), col("pos"), col("col"))
      .as[(Long, Int, Long)].collect()
      .map { case (id, i, off) => (id, i) -> off }.toMap
    durations.as[(Long, Long)].collect().foreach { case (id, dur) =>
      (0 until Multimodal.FrameSamples).foreach { i =>
        assert(planned((id, i)) == i * dur / Multimodal.FrameSamples,
          "seam arithmetic must equal the frameOffsetsMs column")
      }
    }
  }

  test("RealDecoder features for a synthesized GIF video asset") {
    val docs = Seq((11L, "v")).toDF("doc_id", "text")
    val asset = Multimodal.syntheticGifAssets(spark, docs).collect().head
    val feats = Multimodal.RealDecoder.decode(asset)
    assert(feats.kind == "video" && feats.n_bytes == asset.bytes.length.toLong)
    assert(feats.embedding.length == 8 &&
      feats.embedding.forall(v => v >= 0f && v <= 1f))
  }

  test("unigramLogProb: common-token prose outscores rare-token junk; exact hand-check") {
    val s = spark
    import s.implicits._
    // corpus: "a a b" (1), "a b" (2), "zzz qqq" (3)
    // term counts: a=3, b=2, zzz=1, qqq=1 → N=7, V=4
    val d = Seq((1L, "a a b"), (2L, "a b"), (3L, "zzz qqq"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def llp(tc: Long): BigDecimal =
      BigDecimal(math.log((tc + 1).toDouble / 11.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def avg(parts: (Long, Long)*): Double = {
      val q = parts.map { case (tf, tc) => BigDecimal(tf) * llp(tc) }.sum.toDouble /
        parts.map(_._1).sum
      BigDecimal(q).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L)._1 == 3 && out(2L)._1 == 2 && out(3L)._1 == 2)
    assert(out(1L)._2 == avg((2L, 3L), (1L, 2L)), s"got ${out(1L)}")
    assert(out(3L)._2 == avg((1L, 1L), (1L, 1L)), s"got ${out(3L)}")
    // fluency ordering: the common-token docs score above the junk doc
    assert(out(1L)._2 > out(3L)._2 && out(2L)._2 > out(3L)._2)
  }

  test("imageAHash: exact bits on a hand-built gradient; identical images pair at dist 0") {
    val s = spark
    import s.implicits._
    // 8×8 image, luma rises with x: cells are single pixels; columns
    // 4..7 sit above the mean in every row → hash bits set exactly
    // where x >= 4 (the right half of each 8-bit row)
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val grad = png(8, 8, (x, _) => x * 30)
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image", grad, Multimodal.MediaMeta(8, 8, 0, 0L)),
      Multimodal.MediaAsset(2L, "image", grad, Multimodal.MediaMeta(8, 8, 0, 0L)),
      Multimodal.MediaAsset(3L, "image", png(8, 8, (x, _) => (7 - x) * 30),
        Multimodal.MediaMeta(8, 8, 0, 0L))).toDS()
    val hashes = Multimodal.imageAHashes(spark, assets).collect()
      .map(ih => ih.asset_id -> ih).toMap
    // right-half bits per row: mask 0xF0 in each byte row
    val rowMask = 0xF0L
    val wantLo = (0 until 4).map(r => rowMask << (8 * r)).reduce(_ | _)
    assert(hashes(1L).hash_lo == wantLo && hashes(1L).hash_hi == wantLo,
      s"got ${hashes(1L)}")
    assert(hashes(1L) == hashes(2L).copy(asset_id = 1L))
    // mirrored gradient sets the LEFT half — full 64-bit distance 64...
    // actually complementary: every row flips 4 set + 4 unset = 8 bits
    val pairs = Multimodal.imageHammingPairs(
      Multimodal.imageAHashes(spark, assets).toDF(), maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)),
      s"identical images must pair at dist 0, mirror must not: $pairs")
  }

  test("audioAHash: identical clips pair at dist 0 through the real WAV decode") {
    val s = spark
    import s.implicits._
    def wav(f: Int => Int, n: Int): Array[Byte] = {
      val raw = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val v = f(i)
        raw(2 * i) = (v & 0xff).toByte; raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // loud first half, quiet second half → bits exactly on windows 0-31
    val halves = wav(i => if (i < 128) 20000 else 100, 256)
    val assets = Seq(
      Multimodal.MediaAsset(1L, "audio", halves, Multimodal.MediaMeta(0, 0, 16000, 16L)),
      Multimodal.MediaAsset(2L, "audio", halves, Multimodal.MediaMeta(0, 0, 16000, 16L)),
      Multimodal.MediaAsset(3L, "audio", wav(i => if (i < 128) 100 else 20000, 256),
        Multimodal.MediaMeta(0, 0, 16000, 16L))).toDS()
    val hashes = Multimodal.audioAHashes(spark, assets).collect()
      .map(h => h.asset_id -> h).toMap
    assert(hashes(1L).hash_lo == 0xffffffffL && hashes(1L).hash_hi == 0L,
      s"loud-first clip must set exactly windows 0-31: ${hashes(1L)}")
    val pairs = Multimodal.imageHammingPairs(
      Multimodal.audioAHashes(spark, assets).toDF(), maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)),
      s"identical clips pair at dist 0, the mirrored clip must not: $pairs")
  }

  test("charEntropy: exact hand-check; degenerate text flagged, varied text not") {
    val s = spark
    import s.implicits._
    // doc 1: "aaaa" → p(a)=1 → entropy 0, flagged
    // doc 2: "abab" → two chars at p=.5 → exactly 1 bit, flagged
    // doc 3: 16 distinct chars once each → exactly 4 bits, not flagged
    val d = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcdefghijklmnop"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(d, "doc_id", "text")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((4L, 0.0, true)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 1.0, true)), s"got ${out(2L)}")
    assert(out(3L) == ((16L, 4.0, false)), s"got ${out(3L)}")
  }

  test("gopherRepetition: exact char-mass hand-check, coverage unions overlaps") {
    val s = spark
    import s.implicits._
    // doc 1: "a b c d e f a b c d e f" — the 6-gram "a b c d e f"
    //   occurs at positions 0 and 6 (count 2) → EVERY token covered:
    //   dup_mass = 12 tok chars, tok_chars = 12 → frac 1.0.
    //   top 2-gram: "a b"/"b c"/… each count 2, len 3 → mass 6;
    //   "f a" count 1 → max mass 6; text_chars = 23 → 6/23 = 0.2609.
    // doc 2: "x y z w v u t s" — no repeated 2- or 6-gram:
    //   top 2-gram mass = 1·3 = 3, text_chars 15 → 0.2; dup frac 0.
    // doc 3: "p q" — too short for any 6-gram; top 2-gram "p q" mass 3,
    //   text_chars 3 → 1.0 → flagged on the top-gram rule.
    val d = Seq((1L, "a b c d e f a b c d e f"),
      (2L, "x y z w v u t s"), (3L, "p q")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetition(d, "doc_id", "text")
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((0.2609, 1.0, true)), s"got ${out(1L)}")
    assert(out(2L) == ((0.2, 0.0, false)), s"got ${out(2L)}")
    assert(out(3L) == ((1.0, 0.0, true)), s"got ${out(3L)}")
  }

  test("dsirSelect: target-typical docs outrank off-domain docs; top-N honors ties") {
    val s = spark
    import s.implicits._
    // target domain (tgt=true): docs about "the cat sat". Raw pool adds
    // a target-typical doc (4) and an off-domain junk doc (5): the
    // typical doc's hashed grams all carry positive log-ratios (present
    // in target), the junk doc's are target-absent (ct=0 → negative).
    val d = Seq(
      (1L, "the cat sat", true), (2L, "the cat sat here", true),
      (3L, "a cat sat down", true),
      (4L, "the cat sat", false), (5L, "zzz qqq vvv www", false))
      .toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirSelect(d, "doc_id", "text", col("tgt"),
      buckets = 64, topN = 4).as[(Long, Double)].collect()
    assert(out.length == 4)
    val ids = out.map(_._1).toSet
    assert(ids.contains(4L), s"target-typical raw doc must be selected: ${out.toSeq}")
    assert(!ids.contains(5L), s"off-domain junk must rank last: ${out.toSeq}")
    // doc 4's text is doc 1's verbatim → identical grams, identical
    // weight — the deterministic id tie-break keeps both reproducible
    val byId = out.toMap
    assert(byId(4L) == byId(1L), s"identical text must weigh identically: ${out.toSeq}")
    // weights sorted descending; doc 4 (pure target text) has every
    // gram in-target, doc 5 has none — strict order between them
    val w = out.map(_._2)
    assert(w.sameElements(w.sorted(Ordering[Double].reverse)))
  }

  test("dsirSelect: weights are partition-invariant (the DECIMAL-sum design)") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i =>
      (i, (0 until (i % 7 + 2).toInt).map(j => s"w${(i + j) % 11}")
        .mkString(" "), if (i % 3 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.dsirSelect(d, "doc_id", "text", col("lang") === "en",
        buckets = 64, topN = 40).as[(Long, Double)].collect().toSeq
    val base = run(docs)
    // the per-bucket llr is rounded then carried as DECIMAL, so the
    // per-doc sum cannot depend on aggregation order — any partitioning
    // must produce bit-identical weights and the same selection order
    assert(run(docs.repartition(7)) == base)
    assert(run(docs.repartition(1)) == base)
  }

  test("unigramLogProbFrom: reference distribution, OOV floor; exact hand-check") {
    val s = spark
    import s.implicits._
    // reference: "the cat sat on the mat" → the=2, cat/sat/on/mat=1
    // → N=6, V=5, denominator 11
    val ref = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    // scored docs never contribute counts; zzz/qqq are OOV
    val docs = Seq((10L, "the cat"), (11L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProbFrom(ref, docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def llp(tc: Long): BigDecimal =
      BigDecimal(math.log((tc + 1).toDouble / 11.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def avg(parts: (Long, Long)*): Double = {
      val q = parts.map { case (tf, tc) => BigDecimal(tf) * llp(tc) }.sum.toDouble /
        parts.map(_._1).sum
      BigDecimal(q).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(10L)._1 == 2 && out(11L)._1 == 2)
    assert(out(10L)._2 == avg((1L, 2L), (1L, 1L)), s"got ${out(10L)}")
    // both OOV terms sit exactly on the ln(1/(N+V)) floor
    assert(out(11L)._2 == avg((1L, 0L), (1L, 0L)), s"got ${out(11L)}")
    assert(out(10L)._2 > out(11L)._2)
    // self-scoring would have normalized the junk: under ITS OWN corpus
    // doc 11 outscores its reference-LM verdict
    val self = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(self(11L) > out(11L)._2,
      "reference scoring must punish junk harder than self-scoring")
  }

  test("bigramLogProb: corpus-typical transitions outscore one-offs; exact hand-check") {
    val s = spark
    import s.implicits._
    // corpus: "a b c" (1), "a b" (2), "c a" (3)
    // unigrams: a=3, b=2, c=2 → V=3
    // bigrams: "a b"×2, "b c"×1, "c a"×1
    val d = Seq((1L, "a b c"), (2L, "a b"), (3L, "c a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def llp(bc: Long, ucPrev: Long): BigDecimal =
      BigDecimal(math.log((bc + 1).toDouble / (ucPrev + 3).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def avg(parts: (Long, BigDecimal)*): Double = {
      val q = parts.map { case (bf, l) => BigDecimal(bf) * l }.sum.toDouble /
        parts.map(_._1).sum
      BigDecimal(q).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L)._1 == 2 && out(2L)._1 == 1 && out(3L)._1 == 1)
    assert(out(1L)._2 == avg((1L, llp(2, 3)), (1L, llp(1, 2))), s"got ${out(1L)}")
    assert(out(2L)._2 == avg((1L, llp(2, 3))), s"got ${out(2L)}")
    assert(out(3L)._2 == avg((1L, llp(1, 2))), s"got ${out(3L)}")
    // the doc made of the corpus-typical transition outscores the one-off
    assert(out(2L)._2 > out(3L)._2)
  }

  test("bigramLogProbKn: exact integer-ratio hand-check; discount beats add-one on seen transitions") {
    val s = spark
    import s.implicits._
    // corpus as the add-one test: bigrams "a b"×2, "b c"×1, "c a"×1
    // bc: (a b,2) (b c,1) (c a,1); ctx: a→(2,1) b→(1,1) c→(1,1)
    // cont: a→1 b→1 c→1; B=3; D=3/4
    // P(b|a) = (max(8−3,0)·3 + 3·1·1)/(4·3·2) = 18/24 = 3/4
    // P(c|b) = (3+3)/12 = 1/2 = P(a|c)
    val d = Seq((1L, "a b c"), (2L, "a b"), (3L, "c a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProbKn(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def llp(num: Long, den: Long): BigDecimal =
      BigDecimal(math.log(num.toDouble / den.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def avg(parts: (Long, BigDecimal)*): Double = {
      val q = parts.map { case (bf, l) => BigDecimal(bf) * l }.sum.toDouble /
        parts.map(_._1).sum
      BigDecimal(q).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L)._1 == 2 && out(2L)._1 == 1 && out(3L)._1 == 1)
    assert(out(1L)._2 == avg((1L, llp(18, 24)), (1L, llp(6, 12))), s"got ${out(1L)}")
    assert(out(2L)._2 == avg((1L, llp(18, 24))), s"got ${out(2L)}")
    assert(out(3L)._2 == avg((1L, llp(6, 12))), s"got ${out(3L)}")
    // the motivating fix: add-one gives P(c|b) = 2/5 = 0.4; KN keeps the
    // seen transition's discounted mass, 0.5 — rare-context transitions
    // are no longer over-penalized
    assert(math.exp(llp(6, 12).toDouble) > 0.4 + 1e-9)
    // and per-context normalization holds: for prev=a the two UNSEEN
    // continuations each get D·N1p·Pcont/Cprev = 3·1·1/24, so
    // 18/24 + 3/24 + 3/24 = 1 exactly (the interpolated-KN invariant)
    assert(18L + 3L + 3L == 24L)
  }

  test("bigramBothScoresWithBf == the two separate scorings zipped (r18 fusion)") {
    val s = spark
    import s.implicits._
    // mixed corpus: repeats, rare contexts, a 1-token doc (no bigrams —
    // must be absent from BOTH forms), shared and unique transitions
    val d = Seq((1L, "a b c a b"), (2L, "a b"), (3L, "c a x"),
      (4L, "z"), (5L, "b c b c b")).toDF("doc_id", "text")
    val bf = TextAnalysis.bigramBf(d, "doc_id", "text").localCheckpoint(false)
    val uc = d.select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("uc"))
    val fused = TextAnalysis.bigramBothScoresWithBf(bf, uc)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val a = TextAnalysis.bigramLogProbWithBf(bf, uc)
      .select(col("doc_id"), col("avg_logprob").as("sa"))
    val b = TextAnalysis.bigramLogProbKnWithBf(bf)
      .select(col("doc_id"), col("avg_logprob").as("sb"))
    val sep = a.join(b, "doc_id").select("doc_id", "sa", "sb")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(fused.toSeq == sep.toSeq,
      s"fused=${fused.toSeq} separate=${sep.toSeq}")
    assert(!fused.exists(_._1 == 4L)) // no-bigram doc absent from both
  }

  test("rankAgreement: midrank ties, affine invariance, sign of a reversal") {
    val s = spark
    import s.implicits._
    // perfect agreement (with a tie pair) → ρ = 1
    val agree = Seq((1L, 0.1, 10.0), (2L, 0.1, 10.0), (3L, 0.3, 30.0),
      (4L, 0.7, 70.0)).toDF("doc_id", "sa", "sb")
    val r1 = TextAnalysis.rankAgreement(agree)
      .as[(Long, Double)].collect().head
    assert(r1 == ((4L, 1.0)), s"got $r1")
    // perfect reversal → ρ = −1
    val rev = Seq((1L, 0.1, 70.0), (2L, 0.2, 30.0), (3L, 0.3, 20.0),
      (4L, 0.7, 10.0)).toDF("doc_id", "sa", "sb")
    val r2 = TextAnalysis.rankAgreement(rev)
      .as[(Long, Double)].collect().head
    assert(r2 == ((4L, -1.0)), s"got $r2")
    // hand-check with an asymmetric tie: sa = [1,1,2], sb = [3,5,5]
    // midranks×2: ra = [3,3,6]; rb = [2,5,5] (wait: sb ties at the TOP)
    // rb: value 3 → 2·0+1+1 = 2+1? no: 2·less + cnt + 1 = 0+1+1 = 2;
    // value 5 (cnt 2, less 1) → 2+2+1 = 5 → rb = [2,5,5]
    // Pearson over (3,2),(3,5),(6,5): n=3 sx=12 sy=12 sxx=54 syy=54 sxy=51
    // ρ = (153−144)/sqrt(18·18) = 9/18 = 0.5
    val ties = Seq((1L, 1.0, 3.0), (2L, 1.0, 5.0), (3L, 2.0, 5.0))
      .toDF("doc_id", "sa", "sb")
    val r3 = TextAnalysis.rankAgreement(ties)
      .as[(Long, Double)].collect().head
    assert(r3 == ((3L, 0.5)), s"got $r3")
  }

  test("gopher_verdict: a clean doc keeps; a repetition-drowned doc flags exactly that family") {
    val s = spark
    import s.implicits._
    // 60 varied English words with stopwords — passes all four families
    val clean = (1 to 52).map(i => s"word$i").mkString(" ") +
      " the a of and to in is the"
    // the same doc drowned in one repeated token: the top-unigram
    // repetition ratio flags it; the octet still passes (word count
    // within range, stops present)
    val repeaty = clean + " " + Seq.fill(80)("spam").mkString(" ")
    val docs = Seq((1L, clean), (2L, repeaty)).toDF("doc_id", "text")
    val out = graft.packs.TextOps.gopherVerdictOf(docs)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(out(1L) == ((false, false, false, false, true)),
      s"clean doc must keep: ${out(1L)}")
    val (fRules, fRep, fDup, fEnt, keep) = out(2L)
    assert(fRep, "the drowned doc must flag the repetition family")
    assert(!keep, "any flag kills the verdict")
    assert(!fRules, s"the octet itself still passes: ${out(2L)}")
    val _ = (fDup, fEnt)
  }

  test("langMixed: planted code-switching flags; short docs and pure docs don't") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // en stopwords head, de stopwords tail -> the drift the rule hunts
      (1L, "the a of and to der die das und ist"),
      // pure en
      (2L, "the a of and to in is the a of"),
      // 2 tokens whose halves would disagree: below the floor, not mixed
      (3L, "der x"),
      // zh anywhere dominates BOTH halves (cjk probe per half): not mixed
      (4L, "一 一 一 一 一 一"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.langMixed(docs, "doc_id", "text")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (("en", "de", true)), s"got ${out(1L)}")
    assert(out(2L) == (("en", "en", false)))
    assert(!out(3L)._3, "below the token floor never flags")
    assert(out(4L) == (("zh", "zh", false)))
  }

  test("mixtureRatesForTarget: binding group keeps all, ratios achieve the recipe, untargeted drop") {
    val s = spark
    import s.implicits._
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // masses: en = 100 tokens, de = 50, xx = 7 (no target -> dropped)
    val docs = Seq(
      (1L, "en", words(60, "a")), (2L, "en", words(40, "b")),
      (3L, "de", words(50, "c")), (4L, "xx", words(7, "d")))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.mixtureRatesForTarget(docs, "lang",
        size(TextAnalysis.tokens(col("text"))).cast("long"),
        Map("en" -> 5000, "de" -> 5000))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // T = min(100*1e4/5000, 50*1e4/5000) = 100: de binds and keeps all,
    // en halves, and the expected masses hit the 50/50 recipe exactly
    assert(out.keySet == Set("en", "de"), s"untargeted group must drop: $out")
    assert(out("de") == ((50L, 5000L, 10000L, 50L)), s"got ${out("de")}")
    assert(out("en") == ((100L, 5000L, 5000L, 50L)), s"got ${out("en")}")
  }

  test("sourceKlDivergence: zero for a corpus-proportional source, positive otherwise (Gibbs)") {
    val s = spark
    import s.implicits._
    // two sources with IDENTICAL word distributions -> both KL = 0
    val same = Seq((1L, "a", "s1"), (2L, "a b", "s1"),
      (3L, "a", "s2"), (4L, "a b", "s2"))
      .toDF("doc_id", "text", "source")
    val klSame = TextAnalysis.sourceKlDivergence(same, "text", "source")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(klSame("s1") == 0.0 && klSame("s2") == 0.0, s"got $klSame")
    // a divergent source scores > 0; n_tokens is the source's mass
    val skew = Seq((1L, "a a a a", "bulk"), (2L, "z q", "odd"))
      .toDF("doc_id", "text", "source")
    val kl = TextAnalysis.sourceKlDivergence(skew, "text", "source")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(kl("bulk")._1 == 4L && kl("odd")._1 == 2L)
    assert(kl("odd")._2 > 0.0 && kl("bulk")._2 > 0.0,
      "divergent sources must carry positive KL")
    // hand-check "odd": each word c=1 of ns=2, corpus c=1 of n=6:
    // llr = ln(1*6 / (1*2)) = ln 3 per word -> KL = ln 3
    val ln3 = BigDecimal(math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kl("odd")._2 ==
      BigDecimal(ln3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("redactPii: a phone-shaped substring inside an email counts once") {
    val docs = Seq(
      (1L, "contact 555-123-4567@example.com now"),
      (2L, "call 555-123-4567 or mail a@b.co")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // the email swallow the phone-shaped local part: ONE substitution,
    // and n_redacted must agree with the placeholder count
    assert(out(1L) == ("contact <EMAIL> now", 1L))
    assert(out(2L) == ("call <PHONE> or mail <EMAIL>", 2L))
  }

  test("WAV canonicalization: big-endian PCM decodes to the same samples") {
    val samples = Array.tabulate(64)(i => ((9L * 31 + i * 7) % 65536 - 32768).toShort)
    def wavBytes(bigEndian: Boolean): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        val (lo, hi) = ((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
        if (bigEndian) { raw(2 * i) = hi; raw(2 * i + 1) = lo }
        else { raw(2 * i) = lo; raw(2 * i + 1) = hi }
      }
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, bigEndian)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, samples.length),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val le = Multimodal.RealDecoder.decode(
      Multimodal.MediaAsset(1L, "audio", wavBytes(bigEndian = false),
        Multimodal.MediaMeta(0, 0, 16000, 4L)))
    val be = Multimodal.RealDecoder.decode(
      Multimodal.MediaAsset(2L, "audio", wavBytes(bigEndian = true),
        Multimodal.MediaMeta(0, 0, 16000, 4L)))
    assert(le.fingerprint == be.fingerprint,
      "big-endian WAV must canonicalize to the same 16-bit LE samples")
  }
}
