package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-mass vs doc-count temperature mixture: a source contributing
  * few LONG documents must weight by its token mass, not its document
  * count — planted corpus where the two rate orders INVERT, plus the
  * mass = lit(1) ≡ doc-count identity. */
class TempDivergenceSpec extends SparkSpec {
  import spark.implicits._

  // source A: 16 one-token snippets; source B: 4 hundred-token docs.
  // Doc share: A 4x heavier. Token share: B 25x heavier.
  private val docs = (
    (0 until 16).map(i => (i.toLong, "A", "snippet")) ++
    (0 until 4).map(i => (100L + i, "B",
      (0 until 100).map(j => s"w$j").mkString(" ")))
  ).toDF("doc_id", "source", "text")

  private def rates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(col("source"), col("rate_bp")).distinct()
      .as[(String, Long)].collect().toMap

  test("doc-share and token-share rate orders invert on the planted corpus") {
    val mass = size(split(col("text"), " ")).cast("long")
    val byDocs = rates(TextAnalysis.temperatureSample(docs, "source",
      "doc_id", 10L))
    val byTokens = rates(TextAnalysis.temperatureSampleMass(docs, "source",
      "doc_id", mass, 100L))
    // rate ~ 1/sqrt(n_s): the side with MORE mass gets the LOWER rate
    assert(byDocs("A") < byDocs("B"),
      s"doc-count form should thin the many-doc source harder: $byDocs")
    assert(byTokens("A") > byTokens("B"),
      s"token-mass form should thin the long-doc source harder: $byTokens")
  }

  test("a zero-mass source keeps nothing (no Infinity-floored cap rate)") {
    val withEmpty = docs.union(Seq((200L, "C", "x"), (201L, "C", "y"))
      .toDF("doc_id", "source", "text"))
    val out = TextAnalysis.temperatureSampleMass(withEmpty, "source",
      "doc_id", lit(0L), 100L)
    assert(out.count() == 0L, "all-zero mass must keep nothing")
    val mixed = TextAnalysis.temperatureSampleMass(withEmpty, "source",
      "doc_id", when(col("source") === "C", 0L).otherwise(1L), 10L)
    assert(!mixed.select("source").distinct().as[String].collect()
      .contains("C"), "the zero-mass source must be dropped, not capped")
  }

  test("mass = lit(1) reproduces the doc-count form exactly") {
    val a = TextAnalysis.temperatureSample(docs, "source", "doc_id", 10L)
      .select("doc_id", "source", "rate_bp")
      .as[(Long, String, Long)].collect().toSet
    val b = TextAnalysis.temperatureSampleMass(docs, "source", "doc_id",
        lit(1L), 10L)
      .select("doc_id", "source", "rate_bp")
      .as[(Long, String, Long)].collect().toSet
    assert(a == b)
  }
}
