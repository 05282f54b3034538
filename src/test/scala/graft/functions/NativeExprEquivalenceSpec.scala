package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The native codegen expressions must be value-equivalent to the
  * built-in formulations they replaced — property-checked on random
  * inputs so the hot-path rewrites can never drift semantically. */
class NativeExprEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("DotProduct == aggregate(zip_with(_*_)) fold, bit-exact") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(genVec, genVec))) { pairs =>
      val df = pairs.toDF("a", "b")
      val out = df.select(
        VectorOps.dotPrecast(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("builtin"))
        .as[(Double, Double)].collect()
      out.forall { case (n, b) => n == b } // bit-exact, not approx
    })
  }

  test("JaccardSimilarity == size(intersect)/size(union) with distinct semantics") {
    val genArr = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(genArr, genArr))) { pairs =>
      val df = pairs.toDF("a", "b")
      val out = df.select(
        JaccardSimilarity(col("a"), col("b")).as("native"),
        when(size(array_union(col("a"), col("b"))) === 0, lit(0.0))
          .otherwise(size(array_intersect(col("a"), col("b"))).cast("double") /
            size(array_union(col("a"), col("b"))).cast("double")).as("builtin"))
        .as[(Double, Double)].collect()
      out.forall { case (n, b) => n == b }
    })
  }

  test("WordShingles == transform/slice/array_join formulation") {
    val genText = Gen.listOf(Gen.oneOf("w1", "w2", "w3", "x")).map(_.mkString(" "))
    check(Prop.forAll(Gen.nonEmptyListOf(genText)) { texts =>
      val df = texts.toDF("t")
      val toks = split(col("t"), " ")
      val builtin = when(size(toks) < 3, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - lit(2)),
          i => array_join(slice(toks, i, lit(3)), " ")))
      val out = df.select(
        WordShingles(col("t"), 3).as("native"), builtin.as("builtin"))
        .as[(Seq[String], Seq[String])].collect()
      out.forall { case (n, b) => n == b }
    })
  }

  test("CentroidAssign == compositional array_min(struct(dist, cell)) argmin") {
    val genVec = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))
    val centroids = {
      val rnd = new scala.util.Random(3)
      IndexedSeq.fill(5)(IndexedSeq.fill(8)(rnd.nextGaussian()))
    }
    def distSq(emb: org.apache.spark.sql.Column, c: Seq[Double]) =
      lit(c.map(x => x * x).sum) - lit(2.0) * VectorOps.dotPrecast(emb, typedlit(c))
    val compositional = array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSq(col("v"), c).as("d"), lit(i).as("cell"))
    }: _*)).getField("cell")
    check(Prop.forAll(Gen.nonEmptyListOf(genVec)) { vecs =>
      val df = vecs.toDF("v")
      val out = df.select(
        CentroidAssign(col("v"), centroids).as("native"),
        compositional.as("builtin"))
        .as[(Int, Int)].collect()
      out.forall { case (n, b) => n == b }
    })
  }

  test("SimHash64 == explode-tokens aggregate formulation, bit-exact") {
    val genText = Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "x", "", "word"))
      .map(_.mkString(" "))
    check(Prop.forAll(Gen.nonEmptyListOf(genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = df.select(col("doc_id"),
        SimHash64(col("text")).as("simhash"))
      // the aggregate formulation this expression replaced
      val tok = df.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      val bitSums = (0 until 64).map { b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$b")
      }
      val agg = tok.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(b =>
            when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ bitwiseOR _).as("simhash"))
      val n = native.as[(Long, Long)].collect().toMap
      val a = agg.as[(Long, Long)].collect().toMap
      n == a
    }, n = 4)
  }

  test("RollingFp == aggregate(transform(sequence)) per-char fold, bit-exact") {
    // includes non-ASCII (multibyte), control chars, and empty strings —
    // the byte-filter (0x20..0x7E) must match the regexp projection
    val genText = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr, Gen.const(""), Gen.const("héllo wörld 中文"),
      Gen.const("tab\tand\nnewline"), Gen.alphaNumStr)).map(_.mkString(" "))
    check(Prop.forAll(Gen.nonEmptyListOf(genText)) { texts =>
      val df = texts.toDF("text")
      val t = regexp_replace(col("text"), "[^ -~]", "")
      val builtin = when(length(t) === 0, lit(0L)).otherwise(
        aggregate(
          transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1)))),
          lit(0L),
          (acc, c) => (acc * 31 + c) % 1000000007L))
      val out = df.select(RollingFp(col("text")).as("native"), builtin.as("builtin"))
        .as[(Long, Long)].collect()
      out.forall { case (n, b) => n == b }
    })
  }

  test("MinhashBands is deterministic and band-stable under identical shingles") {
    val df = Seq("a b c d e f g", "a b c d e f g", "totally different words here")
      .toDF("t")
    val out = df.select(MinhashBands(WordShingles(col("t"), 3), 8, 4).as("b"))
      .as[Seq[Long]].collect()
    assert(out(0) == out(1))
    assert(out(0) != out(2))
    assert(out(0).length == 8)
  }
}
