package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure the component-loop cost on a LARGE synthetic
  * corpus with a small pair graph — the regime the vertex-seeded loop
  * (r14) targets. At sf0.1 the gate corpus is 5,000 rows, so the
  * corpus-seeded vs vertex-seeded difference drowns in per-round job
  * overhead; here the corpus is `nDocs` (default 2M) rows against
  * `nPairs` (default 2,000) chain pairs, which makes each propagation
  * round's label-table shuffle visible. Chains (not 2-cliques) force
  * MULTIPLE propagation rounds — each of which the corpus-seeded loop
  * pays as a corpus-sized shuffle.
  * Usage: ComponentAb [nDocs] [nChains] [chainLen] [reps]. */
object ComponentAb {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 4000000L
    val nChains = if (args.length > 1) args(1).toLong else 1000L
    val chainLen = if (args.length > 2) args(2).toLong else 16L
    val reps = if (args.length > 3) args(3).toInt else 5
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .localCheckpoint(true)
    // chain c occupies ids [c*chainLen, (c+1)*chainLen); edge j→j+1
    val hops = chainLen - 1
    val pairs = spark.range(nChains * hops)
      .select((expr(s"id div $hops") * chainLen + col("id") % hops).as("doc_a"))
      .withColumn("doc_b", col("doc_a") + 1)
      .localCheckpoint(true)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup
        .nearDupClustersFromPairs(docs.toDF(), "doc_id", pairs.toDF())
        .filter(!col("keep")).count()
      println(f"[componentab] docs=$nDocs chains=$nChains len=$chainLen iter $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (dups=$n)")
    }
    spark.stop()
  }
}
