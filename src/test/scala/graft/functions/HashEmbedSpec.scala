package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The feature-hash embedding: native md5h60 bit-identical to the
  * Column idiom, the one-pass vector equal to the explode/groupBy
  * construction, and the semantic sanity the hashing trick promises. */
class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("native md5h60 == the Column md5h60 idiom") {
    val e = new HashEmbedder(64)
    val words = Seq("the", "cat", "", "中文", "a b", "emb#x")
    val viaColumn = words.toDF("w")
      .select(col("w"), graft.operators.Dedup.md5h60(concat(lit("emb#"), col("w"))))
      .as[(String, Long)].collect().toMap
    words.foreach { w =>
      assert(e.md5h60("emb#" + w) == viaColumn(w),
        s"'$w': native md5h60 diverges from the Column idiom")
    }
  }

  test("one-pass vector == explode/groupBy construction over the corpus") {
    val dim = 64
    val docs = Tables.documents(spark, sf).limit(100)
    val native = docs.select(col("doc_id"),
        posexplode(HashEmbed(col("text"), dim)))
      .filter(col("col") =!= 0.0)
      .select(col("doc_id"), col("pos").cast("long").as("bucket"),
        col("col").as("val"))
    val refRows = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"),
        graft.operators.Dedup.md5h60(concat(lit("emb#"), col("t"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(dim.toLong)).as("bucket"),
        when(pmod(expr(s"h div ${dim}L"), lit(2L)) === 0, 1.0)
          .otherwise(-1.0).as("s"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("s")).as("val"))
      .filter(col("val") =!= 0.0)
    val a = native.as[(Long, Long, Double)].collect().toSet
    val b = refRows.as[(Long, Long, Double)].collect().toSet
    assert(a == b, "native one-pass vector must equal the explode/groupBy form")
  }

  test("semantic sanity: identical texts identical vectors; self-similarity 1") {
    val e = new HashEmbedder(32)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val v1 = e.embed(u("the cat sat on the mat"))
    val v2 = e.embed(u("the cat sat on the mat"))
    assert(v1.toDoubleArray().toSeq == v2.toDoubleArray().toSeq)
    // disjoint token sets give (near-)orthogonal small-overlap vectors,
    // shared tokens raise the dot — the property ANN over these relies on
    val a = e.embed(u("alpha beta gamma")).toDoubleArray()
    val b = e.embed(u("alpha beta gamma delta")).toDoubleArray()
    val c = e.embed(u("zz qq ww")).toDoubleArray()
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    assert(dot(a, b) > dot(a, c),
      "shared-token texts must score above disjoint ones")
  }

  private def cos(x: Array[Double], y: Array[Double]): Double = {
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (p, q) => p * q }.sum
    dot(x, y) / math.sqrt(dot(x, x) * dot(y, y))
  }

  test("char-ngram variant: one-pass vector == substr-window construction") {
    val dim = 64
    val n = 3
    val docs = Tables.documents(spark, sf).limit(100)
    val native = docs.select(col("doc_id"),
        posexplode(HashEmbedNgrams(col("text"), dim, n)))
      .filter(col("col") =!= 0.0)
      .select(col("doc_id"), col("pos").cast("long").as("bucket"),
        col("col").as("val"))
    val refRows = docs
      .select(col("doc_id"), col("text"), explode(sequence(lit(1),
          greatest(length(col("text")) - (n - 1), lit(1)))).as("i"))
      .select(col("doc_id"),
        expr(s"substring(text, i, $n)").as("g"))
      .select(col("doc_id"),
        graft.operators.Dedup.md5h60(concat(lit("embn#"), col("g"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(dim.toLong)).as("bucket"),
        when(pmod(expr(s"h div ${dim}L"), lit(2L)) === 0, 1.0)
          .otherwise(-1.0).as("s"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("s")).as("val"))
      .filter(col("val") =!= 0.0)
    val a = native.as[(Long, Long, Double)].collect().toSet
    val b = refRows.as[(Long, Long, Double)].collect().toSet
    assert(a == b, "native ngram vector must equal the substr-window form")
  }

  test("planted boundary-shift paraphrase: char-ngrams catch what tokens miss") {
    // the same sentence with token boundaries SHIFTED (splits + joins):
    // every touched word becomes an unseen token, so the token space
    // treats them as edits of whole words — but only the few grams
    // straddling each edit point change in the character space
    val dim = 256
    val orig = "the quick brown fox jumps over the lazy dog while the " +
      "cold rain falls on the quiet empty street near the old stone " +
      "bridge at night and nobody walks outside anymore these days " +
      "because the wind keeps howling through the narrow alley"
    val shifted = "the quickbrown fox jumps o ver the lazydog while the " +
      "coldrain falls on the quietempty street near the oldstone " +
      "bridge atnight and no body walksoutside anymore thesedays " +
      "because the windkeeps howling through the narrowalley"
    val tok = new HashEmbedder(dim)
    val ng = new NgramHashEmbedder(dim, 3)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val tokSim = cos(tok.embed(u(orig)).toDoubleArray(),
      tok.embed(u(shifted)).toDoubleArray())
    val ngSim = cos(ng.embed(u(orig)).toDoubleArray(),
      ng.embed(u(shifted)).toDoubleArray())
    assert(ngSim > 0.9,
      f"char-ngram similarity must survive boundary shifts: $ngSim%.3f")
    assert(tokSim < 0.85,
      f"token similarity must show the miss this variant exists for: $tokSim%.3f")
    assert(ngSim - tokSim > 0.1,
      f"ngram ($ngSim%.3f) must clearly beat token ($tokSim%.3f) on shifts")
    // and an unrelated text stays far in BOTH spaces — the gram space
    // doesn't flatten real distinctions
    val other = "completely different subject matter entirely about " +
      "spacecraft navigation systems and orbital mechanics textbooks"
    val farSim = cos(ng.embed(u(orig)).toDoubleArray(),
      ng.embed(u(other)).toDoubleArray())
    assert(farSim < 0.5, f"unrelated texts must stay far: $farSim%.3f")
  }

  test("ngram windows are code-point windows (astral text, oracle parity)") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    val ng = new NgramHashEmbedder(64, 2)
    // 5 identical astral code points (each is a surrogate PAIR in
    // UTF-16) → exactly 4 identical bigrams, so one bucket holds ±4.
    // UTF-16-unit windowing would cut 9 windows of alternating lone
    // surrogates — distinct grams, mass spread over several buckets —
    // and diverge from the DuckDB oracle's len()/substr() code-point
    // semantics on any supplementary-plane corpus.
    val grin = "😀" // U+1F600
    val v = ng.embed(u(grin * 5)).toDoubleArray()
    assert(v.map(math.abs).sum == 4.0,
      s"expected 4 code-point bigrams, got mass ${v.map(math.abs).sum}")
    assert(v.count(_ != 0.0) == 1,
      "identical grams must land in one bucket (no lone-surrogate grams)")
    // mixed BMP/astral: "a😀b" has bigrams "a😀","😀b" — same vector as
    // hashing those two grams via a BMP-free length-2 construction
    val mixed = ng.embed(u(s"a${grin}b")).toDoubleArray()
    assert(mixed.map(math.abs).sum == 2.0,
      "a+astral+b must cut exactly 2 code-point bigrams")
    // BMP-only text is untouched by the code-point fix: window count
    // is still length - n + 1
    val bmp = ng.embed(u("abcd")).toDoubleArray()
    assert(bmp.map(math.abs).sum <= 3.0 && bmp.map(_.abs).sum >= 1.0)
  }
}
