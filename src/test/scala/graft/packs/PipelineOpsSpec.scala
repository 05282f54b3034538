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

  test("audit: one verdict per input doc; keep set == pipeline survivors; dup_of names keepers") {
    val audit = PipelineOps.pipelineCurateAudit(spark, sf)
      .as[(Long, String, Option[Long])].collect()
    val allIds = Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    // total function of the corpus: exactly one row per input doc
    assert(audit.map(_._1).toSet == allIds && audit.length == allIds.size)
    // the audit's keep set IS the pipeline's survivor set
    val kept = PipelineOps.pipelineCurateQuality(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(audit.filter(_._2 == "keep").map(_._1).toSet == kept)
    // every verdict is one of the four; dup_of set exactly on neardup
    // drops, and always names a KEPT doc
    assert(audit.forall(r => Set("keep", "drop_quality", "drop_mixture",
      "drop_neardup").contains(r._2)))
    audit.foreach { case (id, v, dupOf) =>
      assert(dupOf.isDefined == (v == "drop_neardup"),
        s"doc $id: verdict $v with dup_of $dupOf")
      dupOf.foreach(d => assert(kept(d),
        s"doc $id lost to $d, which is not a keeper"))
    }
    assert(audit.exists(_._2 == "drop_quality") &&
      audit.exists(_._2 == "drop_mixture"), "fixture exercises the gates")
  }

  test("curate+strip: same survivors, per-token drop accounting consistent") {
    val kept = PipelineOps.pipelineCurateQuality(spark, sf)
      .select("doc_id", "lang", "quality")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val stripped = PipelineOps.pipelineCurateStrip(spark, sf)
      .as[(Long, String, Double, String, Long)].collect().sortBy(_._1).toSeq
    // the strip stage transforms text; it must not change WHO survives
    assert(stripped.map(r => (r._1, r._2, r._3)) == kept,
      "strip stage changed the survivor set")
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val spans = Dedup.duplicateSpans(
      PipelineOps.pipelineCurateQuality(spark, sf)
        .join(Tables.documents(spark, sf).select("doc_id", "text"), "doc_id"),
      "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    stripped.foreach { case (id, _, _, clean, nDropped) =>
      val orig = texts(id).split(" ", -1)
      val cleanToks = if (clean.isEmpty) Array.empty[String] else clean.split(" ", -1)
      assert(orig.length - cleanToks.length == nDropped,
        s"doc $id: token accounting off (${orig.length} - ${cleanToks.length} != $nDropped)")
      // n_dropped == total span coverage from the detect operator over
      // the SAME survivor corpus (spans are maximal, non-overlapping)
      assert(spans.getOrElse(id, 0L) == nDropped,
        s"doc $id: n_dropped $nDropped != detected span coverage ${spans.getOrElse(id, 0L)}")
      if (nDropped == 0) assert(clean == texts(id), s"doc $id rewritten with no spans")
    }
  }

  test("curate+strip: dedup retires copies BEFORE strip; shared boilerplate stripped") {
    // Two distinct high-quality docs sharing an 11-token boilerplate
    // block (jaccard far below the near-dup threshold), plus an exact
    // duplicate pair with no boilerplate. lang "zh" samples at 100%.
    val boiler = "this is the shared boilerplate header of the corpus legal notice"
    def words(p: String): String = (0 until 200).map(i => s"word$p$i the").mkString(" ")
    val docA = boiler + " " + words("a")
    val docB = words("b").split(" ", -1).take(100).mkString(" ") + " " + boiler +
      " " + words("b").split(" ", -1).drop(100).mkString(" ")
    val docC = words("c")
    val corpus = Seq(
      (1L, "zh", docA), (2L, "zh", docB), (3L, "zh", docC), (4L, "zh", docC))
      .toDF("doc_id", "lang", "text")
    val out = PipelineOps.curateStrip(corpus)
      .as[(Long, String, Double, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 4 is an exact copy of 3: canonical-copy retention drops it
    assert(out.keySet == Set(1L, 2L, 3L), s"survivors: ${out.keySet}")
    // the boilerplate block (11 tokens, >= k=8) is duplicated between
    // the two SURVIVORS — stripped from both, position-independent
    for (id <- Seq(1L, 2L)) {
      assert(out(id)._5 == 11L, s"doc $id: expected the 11-token block dropped, got ${out(id)._5}")
      assert(!out(id)._4.contains("boilerplate"), s"doc $id still carries the block")
    }
    assert(out(1L)._4 == words("a"), "doc 1: strip must remove exactly the block")
    // doc 3's body was duplicated only by the RETIRED copy — because
    // dedup runs first, the canonical survivor is not self-duplicated
    // and passes through unstripped
    assert(out(3L)._5 == 0L && out(3L)._4 == docC,
      "canonical survivor of the dup pair must pass through unstripped")
  }

  test("curate+pack: layout covers exactly the strip survivors, token counts from CLEANED text") {
    val stripped = PipelineOps.pipelineCurateStrip(spark, sf)
      .as[(Long, String, Double, String, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val packed = PipelineOps.pipelineCuratePack(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(packed.length == stripped.size,
      "every strip survivor lands in the layout exactly once")
    // n_tokens counts the CLEANED text — the layout is of what ships
    packed.foreach { case (id, _, _, n, _, _, _) =>
      assert(n == stripped(id).split(" ", -1).length.toLong,
        s"doc $id: packed n_tokens $n != cleaned token count")
    }
    // per-shard seam exactness, same invariant as ShardPackSpec
    val B = TextOps.PackBudget
    packed.groupBy(_._2).foreach { case (shard, rs) =>
      val inOrder = rs.sortBy(_._3)
      assert(inOrder.map(_._3).toSeq == (1L to rs.length).toSeq,
        s"shard $shard: positions must be 1..n contiguous")
      var cum = 0L
      inOrder.foreach { case (id, _, _, n, first, last, off) =>
        assert(off == cum % B && first == cum / B && last == (cum + n - 1) / B,
          s"doc $id: seam broken")
        cum += n
      }
    }
  }
}
