package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.{GraftSparkExtensions, SparkSpec}

/** The SQL surface of the native expressions: every registered
  * `graft_*` function must produce exactly what its Column API builds
  * (same expression class → trivially same values; these tests pin the
  * registration/argument plumbing), and the SparkSessionExtensions
  * injection path must land the same functions. */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b c")).toDF("doc_id", "text")

  GraftFunctions.register(spark)
  docs.createOrReplaceTempView("gf_docs")

  test("graft_simhash64 in SQL == SimHash64 Column API") {
    val sql = spark.sql(
      "SELECT doc_id, graft_simhash64(text) AS h FROM gf_docs")
      .as[(Long, Long)].collect().toMap
    val api = docs.select(col("doc_id"), SimHash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(sql == api)
  }

  test("graft_rolling_fp in SQL == RollingFp Column API") {
    val sql = spark.sql(
      "SELECT doc_id, graft_rolling_fp(text) AS fp FROM gf_docs")
      .as[(Long, Long)].collect().toMap
    val api = docs.select(col("doc_id"), RollingFp(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(sql == api)
  }

  test("graft_shingles + graft_jaccard in SQL == Column API") {
    val sql = spark.sql(
      """SELECT graft_jaccard(graft_shingles(a.text, 3), graft_shingles(b.text, 3)) AS j
        |FROM gf_docs a JOIN gf_docs b ON a.doc_id = 1 AND b.doc_id = 1""".stripMargin)
      .as[Double].head()
    assert(sql == 1.0)
    val cross = spark.sql(
      """SELECT graft_jaccard(graft_shingles(a.text, 3), graft_shingles(b.text, 3)) AS j
        |FROM gf_docs a JOIN gf_docs b ON a.doc_id = 1 AND b.doc_id = 2""".stripMargin)
      .as[Double].head()
    assert(cross == 0.0)
  }

  test("graft_dot in SQL == DotProduct Column API, bit-exact") {
    val vecs = Seq((Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 2.0))).toDF("a", "b")
    vecs.createOrReplaceTempView("gf_vecs")
    val sql = spark.sql("SELECT graft_dot(a, b) AS d FROM gf_vecs").as[Double].head()
    val api = vecs.select(DotProduct(col("a"), col("b")).as("d")).as[Double].head()
    assert(sql == api && sql == 4.5)
  }

  test("graft_minhash / graft_minhash_bands reject non-literal shape args and work in SQL") {
    val sig = spark.sql(
      """SELECT graft_minhash(transform(graft_shingles(text, 3), x -> xxhash64(x)), 8) AS s
        |FROM gf_docs WHERE doc_id = 1""".stripMargin)
      .as[Seq[Long]].head()
    assert(sig.length == 8)
    val bands = spark.sql(
      "SELECT graft_minhash_bands(graft_shingles(text, 3), 8, 4) AS b FROM gf_docs WHERE doc_id = 1")
      .as[Seq[Long]].head()
    assert(bands.length == 8)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, doc_id) FROM gf_docs").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("BloomContains matches stat.bloomFilter's string encoding (no false negatives)") {
    // the filter is built by DataFrameStatFunctions over a string
    // column; the native expression must hash the same UTF-8 bytes —
    // every inserted value (incl. multibyte) MUST test true
    val vals = Seq("alpha", "beta", "γδε multibyte", "1234")
    val df = vals.toDF("s")
    val bf = df.stat.bloomFilter("s", 100, 0.01)
    val got = df.select(col("s"), BloomContains(col("s"), bf).as("hit"))
      .as[(String, Boolean)].collect().toMap
    assert(got.values.forall(identity), s"false negative: $got")
    // and a value never inserted is (with these sizes) absent
    val miss = Seq("definitely not inserted zzz").toDF("s")
      .select(BloomContains(col("s"), bf)).as[Boolean].head()
    assert(!miss)
  }

  test("GraftSparkExtensions injects the same functions (builder-time path)") {
    val ext = new SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    // apply the built extensions to this session's live registry and
    // prove a round-trip through one of the injected functions
    bridge.applyExtensionsToSession(ext, spark)
    val h = spark.sql("SELECT graft_simhash64('a b c') AS h").as[Long].head()
    assert(h == SimHash64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
  }
}
