package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.packs.TextOps
import graft.streaming.StreamingPipelines

/** The persisted benchmark shingle set: store-backed probe ==
  * inline contamination, eval-suite growth via idempotent merges,
  * and the ingest gate dropping exactly the flagged docs. */
class BenchmarkStoreSpec extends SparkSpec {
  import spark.implicits._

  private type Verdict = (Long, Long, Boolean)

  test("store probe == inline contamination on the corpus split") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % TextOps.ContamBenchMod
      === TextOps.ContamBenchRem)
    val train = docs.filter(col("doc_id") % TextOps.ContamBenchMod
      =!= TextOps.ContamBenchRem)
    val store = new BenchmarkStore("graft_bench_spec")
    store.ingest(bench, "text")
    val fromStore = store.overlaps(train, "doc_id", "text",
      TextOps.ContamMinOverlap).as[Verdict].collect().sortBy(_._1)
    val inline = TextAnalysis.contamination(train, bench, "doc_id", "text",
      minOverlap = TextOps.ContamMinOverlap).as[Verdict].collect().sortBy(_._1)
    assert(fromStore.nonEmpty && fromStore.toSeq == inline.toSeq,
      "store-backed probe must equal the inline operator")
    assert(fromStore.exists(_._3), "split must flag something")

    // plan pin: the store side is a bare scan of the persisted shingle
    // table — exactly ONE Generate (the PROBE side's shingle explode);
    // the inline form pays two
    val p = store.overlaps(train, "doc_id", "text", TextOps.ContamMinOverlap)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_bench_spec"),
      s"probe must scan the persisted shingle table:\n$p")
    val generates = "\\bGenerate\\b".r.findAllIn(p).size
    assert(generates == 1,
      s"only the probe side may shingle/explode (got $generates Generates):\n$p")
  }

  test("eval-suite growth: merged sets union, replays no-op, verdicts are as-of-probe") {
    val store = new BenchmarkStore("graft_bench_spec_grow")
    val eval1 = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val eval2 = Seq((2L, "omega psi chi phi")).toDF("doc_id", "text")
    val probe = Seq(
      (10L, "x alpha beta gamma y"),   // contaminated by eval1
      (11L, "x omega psi chi y"),      // contaminated by eval2 only
      (12L, "totally clean doc here")
    ).toDF("doc_id", "text")
    store.ingest(eval1, "text", batchId = 0L)
    def flagged(): Set[Long] = store.overlaps(probe, "doc_id", "text")
      .filter(col("flagged")).select(col("doc_id")).as[Long].collect().toSet
    assert(flagged() == Set(10L), "before eval2 merges, only doc 10 flags")
    store.ingest(eval2, "text", batchId = 1L)
    assert(flagged() == Set(10L, 11L), "a grown suite re-judges at probe time")
    // at-least-once replay of an eval merge is a no-op
    store.ingest(eval2, "text", batchId = 1L)
    assert(flagged() == Set(10L, 11L))
  }

  test("ingest gate: contaminated docs die, clean rows pass untouched") {
    val store = new BenchmarkStore("graft_bench_spec_gate")
    store.ingest(Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "text")
    val batch = Seq(
      (10L, "en", "x alpha beta gamma y"),
      (12L, "de", "totally clean doc here")
    ).toDF("doc_id", "lang", "text")
    val out = StreamingPipelines.decontaminateGateBatch(store, batch,
      "doc_id", "text").as[(Long, String, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(12L), "contaminated doc must die")
    assert(out.head == ((12L, "de", "totally clean doc here")),
      "surviving rows pass through with all their columns")
  }
}
