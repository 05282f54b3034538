package graft.packs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded epoch shuffle of the packed layout: the permutation must be
  * a bijection over exactly the occupied sequences, deterministic in
  * the seed, and different across epochs. */
class PackShuffleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows =
    TextOps.packIdsShuffled(spark, sf)
      .as[(Long, Long, Long, Long)].collect()

  test("permutes exactly the sequences the materialized layout emits") {
    val shuffled = rows.filter(_._1 == 0L).map(r => (r._2, r._3)).toSet
    val layout = TextOps.packIdsBpe(spark, sf)
      .select(col("shard"), col("seq_id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(shuffled == layout,
      s"extra=${shuffled -- layout} missing=${layout -- shuffled}")
    assert(shuffled.nonEmpty)
  }

  test("per (epoch, shard): positions are a bijection 0..n-1") {
    rows.groupBy(r => (r._1, r._2)).foreach { case ((e, sh), grp) =>
      val pos = grp.map(_._4).sorted.toSeq
      assert(pos == (0L until grp.length).toSeq,
        s"epoch=$e shard=$sh positions not dense: $pos")
    }
  }

  test("seed-deterministic: a second evaluation is identical") {
    val again = TextOps.packIdsShuffled(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("epochs read DIFFERENT orders (some shard's permutations differ)") {
    val byEpoch = rows.groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3) -> r._4).toMap).toMap
    assert(byEpoch.size == TextOps.PackEpochs)
    // identical permutations every epoch would make the shuffle useless
    assert(byEpoch(0L) != byEpoch(1L),
      "epoch 0 and epoch 1 produced the same global permutation")
  }

  test("epochs/budget preconditions refuse instead of emitting phantom epochs") {
    val docs = graft.Tables.documents(spark, sf)
    def mass = size(split(col("text"), " ")).cast("long")
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.packEpochShuffleCounted(docs, "doc_id",
        TextOps.NumShards, TextOps.PackBudget, 0, 1L, mass)
    }
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.packEpochShuffleCounted(docs, "doc_id",
        TextOps.NumShards, 0, 1, 1L, mass)
    }
  }

  test("the generated unigram oracle stays valid SQL at maxWordLen = 1") {
    val sql = TextOps.unigramCtes(
      graft.operators.UnigramLmTokenizer.Model(Seq(("a", 1L)), 1))
    assert(!sql.contains(", ,") && !sql.contains(",,"),
      s"wl=1 must not leave an empty path-CTE splice:\n$sql")
    assert(sql.contains("up0") && !sql.contains("up1"),
      "wl=1 backtracks from up0 alone")
  }

  test("a different seed produces a different permutation") {
    val docs = graft.Tables.documents(spark, sf)
    def perm(seed: Long) = graft.operators.TextAnalysis
      .packEpochShuffleCounted(docs, "doc_id", TextOps.NumShards,
        TextOps.PackBudget, 1, seed, size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(perm(1L) != perm(2L))
  }
}
