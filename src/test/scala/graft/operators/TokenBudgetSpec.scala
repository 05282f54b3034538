package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.packs.TextOps

/** Token-budget sampling: the bucket-prefix decomposition must equal
  * the naive global-order running sum exactly, respect the budget,
  * keep a true prefix of the priority order, and never run an
  * unpartitioned window. */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def reference(budget: Long): Seq[(Long, Long)] = {
    val scored = Tables.documents(spark, sf)
      .select(col("doc_id"),
        pmod(Dedup.md5h60(concat(lit("budget#"), col("doc_id").cast("string"))),
          lit(1L << 60)).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._1))
    var cum = 0L
    scored.flatMap { case (id, _, n) =>
      cum += n
      if (cum <= budget) Some((id, n)) else None
    }.toSeq
  }

  test("decomposed sample == global running-sum reference; budget and prefix hold") {
    val budget = TextOps.TokenSampleBudget
    val got = TextAnalysis.tokenBudgetSample(Tables.documents(spark, sf),
      "doc_id", "text", budget, nBuckets = 64)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = reference(budget).sortBy(_._1)
    assert(got == want, s"decomposition must equal the global window " +
      s"(got ${got.size} vs ${want.size} docs)")
    assert(got.map(_._2).sum <= budget, "kept mass must respect the budget")
    assert(got.nonEmpty && got.size < 500, "the gate budget must cut mid-corpus")
  }

  test("whole corpus fits: everything kept, no window at all") {
    val df = TextAnalysis.tokenBudgetSample(Tables.documents(spark, sf),
      "doc_id", "text", Long.MaxValue, nBuckets = 64)
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "the fits-entirely path must not plan a window")
  }

  test("plan: the boundary window is partitioned by bucket — never global") {
    val p = TextAnalysis.tokenBudgetSample(Tables.documents(spark, sf),
      "doc_id", "text", TextOps.TokenSampleBudget, nBuckets = 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(bucket"),
      s"the boundary cumsum must be partitioned by bucket:\n$p")
  }
}
