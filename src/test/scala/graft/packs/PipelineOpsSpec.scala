package graft.packs

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** The composed curation pipeline must honor each stage's contract on
  * real testdata: every surviving doc clears the quality floor, no two
  * survivors are near-dups of each other (the clustering stage's whole
  * point), and the output is deterministic run to run. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: quality floor, canonical-only, deterministic") {
    val rows = PipelineOps.pipelineCurate(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(rows.nonEmpty, "curation must keep something")
    assert(rows.forall(_._3 >= PipelineOps.QualityMin),
      s"kept docs below the quality floor: ${rows.filter(_._3 < PipelineOps.QualityMin).take(3).toSeq}")
    // no near-dup pair may survive — one canonical doc per cluster
    val kept = rows.map(_._1).toSet
    val pairs = Dedup.blockedNgramJaccard(Tables.documents(spark, sf), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    val survivors = pairs.filter(p => kept(p._1) && kept(p._2))
    assert(survivors.isEmpty, s"near-dup pairs both kept: ${survivors.take(3).toSeq}")
    val again = PipelineOps.pipelineCurate(spark, sf)
      .as[(Long, String, Double)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "pipeline must be deterministic")
  }
}
