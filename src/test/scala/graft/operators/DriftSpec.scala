package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The Jensen-Shannon drift monitor: hand-computed divergence on a
  * planted pair, identical-distribution zero, novel-vocabulary
  * finiteness (the reason JS is the monitor, not KL), store-probe ≡
  * recompute parity on the sf split, and the ln 2 bound. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def js(batch: Seq[(Long, String)], seen: Seq[(Long, String)]): Double =
    TextAnalysis.jsDriftVsCorpus(
      batch.toDF("doc_id", "text"), "text",
      TextAnalysis.wordCounts(seen.toDF("doc_id", "text"), "text"))
      .select("js_nats").as[Double].collect().head

  test("hand-computed JS on a planted pair (round-6 terms, round-4 sum)") {
    // batch "a a b": P(a)=2/3, P(b)=1/3; seen "a b b b": Q(a)=1/4, Q(b)=3/4
    val got = js(Seq((1L, "a a b")), Seq((2L, "a b b b")))
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpA = r6(math.log(2d * 2 * 4 / (2d * 4 + 1 * 3)))
    val lqA = r6(math.log(2d * 1 * 3 / (2d * 4 + 1 * 3)))
    val lpB = r6(math.log(2d * 1 * 4 / (1d * 4 + 3 * 3)))
    val lqB = r6(math.log(2d * 3 * 3 / (1d * 4 + 3 * 3)))
    val want = ((2 * lpA + 1 * lpB) / 3d + (1 * lqA + 3 * lqB) / 4d) / 2d
    assert(math.abs(got - want) <= 0.00011, s"got $got want ~$want")
  }

  test("identical distributions drift zero; disjoint vocab hits the ln 2 bound") {
    assert(js(Seq((1L, "x y z")), Seq((2L, "x y z"), (3L, "x y z"))) == 0.0)
    // fully novel batch vocabulary: KL would be +inf; JS = ln 2 exactly
    val disjoint = js(Seq((1L, "p q r")), Seq((2L, "x y z")))
    assert(math.abs(disjoint - math.log(2)) <= 0.0002, s"got $disjoint")
  }

  test("top contributors: symmetric planted case ranks by word on equal contribution") {
    // disjoint vocab, all counts 1: every word contributes ln2/3 (batch
    // side) or ln2/3 (seen side) — equal, so the order is word ASC
    val got = TextAnalysis.jsDriftTopTerms(
      Seq((1L, "p q r")).toDF("doc_id", "text"), "text",
      TextAnalysis.wordCounts(Seq((2L, "x y z")).toDF("doc_id", "text"), "text"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("p", "q", "r", "x", "y", "z"), s"got $got")
    val c = BigDecimal(math.log(2) / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (w, b, s, contrib) =>
      assert(math.abs(contrib - c) <= 0.000002, s"$w: $contrib")
      assert((b == 1 && s == 0) || (b == 0 && s == 1), s"$w: $b/$s") }
  }

  test("JS is bounded and non-negative on the sf corpus, every source present") {
    val docs = Tables.documents(spark, sf)
    // stride WITHIN sources (the corpus round-robins source over
    // doc_id, so a plain mod split leaves nothing to compare)
    val inSrcIdx = expr("doc_id div 20") % 5
    val rows = TextAnalysis.jsDriftBySource(
      docs.filter(inSrcIdx === 0),
      docs.filter(inSrcIdx =!= 0),
      "source", "text")
      .select("source", "js_nats").as[(String, Double)].collect()
    assert(rows.length == 20, s"got ${rows.length} sources")
    rows.foreach { case (s, v) =>
      assert(v >= 0.0 && v <= math.log(2) + 0.0001, s"$s: $v") }
  }

  test("store probe ≡ recompute on the sf split; seen side never re-tokenizes") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val seen = docs.filter(col("doc_id") % 5 =!= 0)
    val store = new LexStore("graft_drift_spec_lex", buckets = 2)
    store.ingest(seen, "doc_id", "text")
    val seenCounts = store.table(spark)
      .filter(col("term").isNotNull)
      .groupBy(col("term")).agg(sum(col("tf")).as("n"))
      .select(col("term").as("word"), col("n"))
    // plan pin on the seen-side COMPONENT (the merged histogram
    // checkpoints inside jsDriftGrouped, hiding its lineage from the
    // composite plan): the fold reads the persisted posting table and
    // never tokenizes
    val seenPlan = seenCounts.queryExecution.executedPlan.toString
    assert(seenPlan.contains("graft_drift_spec_lex"),
      s"the drift baseline must fold the persisted posting table:\n$seenPlan")
    assert(!seenPlan.contains("split("),
      s"the posting fold must not re-tokenize the corpus:\n$seenPlan")
    val probe = TextAnalysis.jsDriftVsCorpus(batch, "text", seenCounts)
    val got = probe.as[(Long, Long, Double)].collect().head
    val want = TextAnalysis.jsDriftVsCorpus(batch, "text",
      TextAnalysis.wordCounts(seen, "text"))
      .as[(Long, Long, Double)].collect().head
    assert(got == want, s"store $got != inline $want")
  }
}
