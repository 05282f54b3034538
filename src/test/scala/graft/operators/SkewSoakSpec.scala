package graft.operators

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew soak for the dedup bucket/block caps (VERDICT r06 "What's wrong 1").
  *
  * Synthesizes a degenerate corpus — one boilerplate prefix/bucket with
  * 12000 members, 12x over the 1000 cap — and measures per-STAGE task
  * skew: max task shuffle-read records / mean. The old
  * `count().over(Window.partitionBy(...))` cap had no partial
  * aggregation and AQE cannot split a window partition, so the whole
  * degenerate block funneled into ONE task just to be counted and
  * dropped — the control test reproduces that shape and proves the
  * funnel (skew ratio ~25 at 32 shuffle partitions). The production cap
  * (partial-agg count + broadcast anti-join, Dedup.scala) keeps every
  * stage's skew bounded regardless of bucket degeneracy, while still
  * finding the planted near-dup pair outside the degenerate block.
  *
  * Record counts, not wall-clock: per-task shuffle-read records are
  * deterministic where timings on local[4] are noise. AQE partition
  * coalescing is pinned OFF for these runs (at soak scale it merges the
  * tiny shuffles into one task, which would mask per-key skew — on a
  * real cluster the degenerate key exceeds the coalesce target and
  * lands alone in its task regardless), and shuffle partitions are
  * raised to 32 so a hash-distributed stage has a meaningful mean.
  */
class SkewSoakSpec extends SparkSpec {

  private val Boiler = 12000 // one degenerate block, 12x the 1000 cap
  private val CleanN = 3000

  /** Degenerate corpus: `Boiler` docs sharing a 44-char boilerplate
    * prefix (one prefix block — and shared-shingle LSH buckets — well
    * over the cap) with unique md5 tails, plus `CleanN` distinct docs,
    * plus one planted near-dup pair (J = 10/12) in a non-degenerate
    * block. */
  private def degenerateDocs = {
    val s = spark
    import s.implicits._
    val prefix = "the quick brown fox jumps over the lazy dog " // 44 chars > prefixLen 40
    val boiler = s.range(0, Boiler).select(col("id").as("doc_id"),
      concat(lit(prefix), md5(col("id").cast("string")), lit(" "),
        md5((col("id") + 1).cast("string"))).as("text"))
    val clean = s.range(100000, 100000L + CleanN).select(col("id").as("doc_id"),
      concat_ws(" ", md5(col("id").cast("string")),
        md5((col("id") * 7 + 1).cast("string")),
        md5((col("id") * 13 + 2).cast("string")),
        md5((col("id") * 31 + 3).cast("string"))).as("text"))
    val dupBase = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val planted = Seq(
      (900001L, dupBase + " nu"),
      (900002L, dupBase + " xi")).toDF("doc_id", "text")
    boiler.union(clean).union(planted)
  }

  private case class StageSkew(tasks: Int, total: Long, max: Long) {
    def ratio: Double = if (tasks < 2 || total == 0) 1.0
      else max.toDouble / (total.toDouble / tasks)
  }

  /** Runs `action` under soak confs (32 shuffle partitions, AQE coalesce
    * off) with a task-metrics listener attached; returns (result,
    * worst per-stage skew ratio over stages with >=2 tasks and >=1000
    * shuffle-read records, max single-task shuffle read). Polls the
    * async listener bus until metrics go quiet. */
  private def measureSkew[T](action: => T): (T, Double, Long) = {
    val conf = spark.conf
    val oldParts = conf.get("spark.sql.shuffle.partitions")
    val oldCoalesce = conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, StageSkew]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          stages.merge(te.stageId, StageSkew(1, r, r),
            (a, b) => StageSkew(a.tasks + b.tasks, a.total + b.total,
              math.max(a.max, b.max)))
        }
      }
    }
    conf.set("spark.sql.shuffle.partitions", "32")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = action
      var last = -1L
      var stable = 0
      var waited = 0
      def snapshot(): Long = {
        var s = 0L
        stages.forEach((_, v) => s += v.total + v.tasks)
        s
      }
      while (stable < 3 && waited < 100) {
        Thread.sleep(100); waited += 1
        val cur = snapshot()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      var worst = 1.0
      var maxRead = 0L
      stages.forEach { (_, v) =>
        if (v.tasks >= 2 && v.total >= 1000) worst = math.max(worst, v.ratio)
        maxRead = math.max(maxRead, v.max)
      }
      (out, worst, maxRead)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      conf.set("spark.sql.shuffle.partitions", oldParts)
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", oldCoalesce)
    }
  }

  /** The PRE-round-7 window-count cap, kept as an executable control: it
    * must funnel the whole degenerate block into one task. If this test
    * ever fails, Spark learned to split window partitions and the
    * hazard class should be re-assessed. */
  private def windowCapControl(docs: DataFrame): DataFrame = {
    val t0 = docs.select(col("doc_id"),
      substring(col("text"), 1, Dedup.NgramPrefixLen).as("blk"),
      Dedup.shinglesFromText(col("text"), Dedup.NgramShingleN).as("sh"))
    val t = t0
      .withColumn("blk_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("blk"))))
      .filter(col("blk_n") <= Dedup.NgramMaxBlockSize)
      .drop("blk_n")
    val a = t.select(col("blk"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = t.select(col("blk"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, "blk")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= Dedup.NgramThreshold)
  }

  test("window-count control: degenerate block funnels into one straggler task") {
    val (rows, worst, maxRead) = measureSkew {
      windowCapControl(degenerateDocs).collect()
    }
    // semantics are fine either way — the planted pair is found
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((900001L, 900002L)))
    // ... but one task read the ENTIRE degenerate block to count it
    assert(maxRead >= Boiler,
      s"control expected a >=$Boiler-record straggler task, saw max=$maxRead")
    assert(worst >= 8.0,
      f"control expected heavy stage skew, saw worst max/mean = $worst%.1f")
    info(f"window control: worst stage skew $worst%.1fx, max task read $maxRead%,d records")
  }

  test("production block cap: stage skew bounded under a degenerate block") {
    val (rows, worst, maxRead) = measureSkew {
      Dedup.blockedNgramJaccard(degenerateDocs, "doc_id", "text").collect()
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((900001L, 900002L)),
      "planted near-dup pair must survive the cap rewrite")
    assert(worst <= 4.0,
      f"anti-join cap must keep stages balanced, saw worst max/mean = $worst%.1f")
    assert(maxRead < Boiler,
      s"no task may read the whole degenerate block: max=$maxRead")
    info(f"production cap: worst stage skew $worst%.1fx, max task read $maxRead%,d records")
  }

  test("production LSH bucket cap: stage skew bounded under degenerate buckets") {
    val (rows, worst, maxRead) = measureSkew {
      Dedup.minhashLsh(degenerateDocs, "doc_id", "text").collect()
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet.contains((900001L, 900002L)),
      "planted near-dup pair must be found by LSH")
    assert(worst <= 4.0,
      f"bucket cap must keep stages balanced, saw worst max/mean = $worst%.1f")
    info(f"production LSH cap: worst stage skew $worst%.1fx, max task read $maxRead%,d records")
  }

  /** Degenerate-FINGERPRINT corpus for the simhash path: `Boiler`
    * byte-identical docs share ONE 64-bit simhash — identical values on
    * all 4 bands, the worst case for the band join (an uncapped join
    * would emit m²/2 ≈ 72M candidate rows; no AQE split undoes a
    * quadratic intermediate). A planted exact-dup pair sits in its own
    * 2-member buckets and must survive the cap. */
  private def identicalFingerprintDocs = {
    val s = spark
    import s.implicits._
    val boilerText = "standard boilerplate terms of service apply to every " +
      "document in this mass duplicated corpus without any variation"
    val boiler = s.range(0, Boiler).select(col("id").as("doc_id"),
      lit(boilerText).as("text"))
    val clean = s.range(100000, 100000L + CleanN).select(col("id").as("doc_id"),
      concat_ws(" ", md5(col("id").cast("string")),
        md5((col("id") * 7 + 1).cast("string")),
        md5((col("id") * 13 + 2).cast("string"))).as("text"))
    val planted = Seq(
      (900001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (900002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    boiler.union(clean).union(planted)
  }

  /** Degenerate-EMBEDDING corpus for the vector LSH path: `Boiler`
    * IDENTICAL embeddings land in the same hyperplane bucket of EVERY
    * table (12x over the cap — the collapsed-encoder / vectorized-
    * boilerplate case; an uncapped bucket join would emit m²/2 ≈ 72M
    * candidates per table). Clean vectors are random ±1 sign patterns
    * (32 dims: chance cosine ≥ 0.9 needs ≥ 31/32 agreeing signs,
    * ~1e-8 over all clean pairs). The planted near pair differs in ONE
    * sign (cos = 30/32 = 0.9375) in its own small buckets. */
  private def degenerateEmbeddings = {
    val s = spark
    import s.implicits._
    val dim = 32
    val boiler = s.range(0, Boiler).select(col("id").as("vec_id"),
      array((0 until dim).map(_ => lit(1.0)): _*).as("embedding"))
    val clean = s.range(100000, 100000L + CleanN).select(col("id").as("vec_id"),
      array((0 until dim).map(j =>
        when(pmod(xxhash64(col("id"), lit(j)), lit(2)) === 0, lit(1.0))
          .otherwise(lit(-1.0))): _*).as("embedding"))
    val base = (0 until dim).map(j => if (j % 3 == 0) 1.0 else -1.0)
    val planted = Seq(
      (900001L, base),
      (900002L, base.updated(0, -1.0))).toDF("vec_id", "embedding")
    boiler.union(clean).union(planted)
  }

  test("production embedding LSH cap: skew bounded under an identical-embedding block") {
    val (rows, worst, maxRead) = measureSkew {
      SimilaritySearch.lshNearDupPairs(degenerateEmbeddings,
        threshold = 0.9, dim = 32).collect()
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((900001L, 900002L)),
      "planted near pair in a small bucket must survive the cap")
    // the identical-embedding block shares ALL tables' buckets, every
    // one over the cap → dropped whole (documented: route mass-dup
    // vectors through exact dedup on a vector hash first)
    assert(!pairs.exists(p => p._1 < Boiler && p._2 < Boiler),
      "over-cap embedding bucket must be dropped, not paired")
    assert(worst <= 4.0,
      f"embedding bucket cap must keep stages balanced, saw worst max/mean = $worst%.1f")
    assert(maxRead < Boiler,
      s"no task may read the whole degenerate embedding bucket: max=$maxRead")
    info(f"production embedding cap: worst stage skew $worst%.1fx, max task read $maxRead%,d records")
  }

  /** The SemDeDup path under the same degenerate corpus: the
    * identical-embedding block collapses into ONE k-means cell (12000
    * rows — 6x the test cap; an uncapped within-cell join would emit
    * 72M pairs there), while the planted near pair shares a normal
    * cell. The training draw is ~80% identical boiler vectors, so the
    * quantizer effectively yields one boiler cell and one cell holding
    * ALL ~3000 clean vectors — cap 4000 (3x under the boiler block)
    * keeps that clean cell while dropping the collapsed one, which is
    * exactly the production setting: cap above the p99 cell, below the
    * degenerate one. */
  test("production semantic cell cap: skew bounded under a collapsed-encoder cell") {
    val corpus = degenerateEmbeddings
    val centroids = IvfIndex.train(corpus, nlist = 4, iters = 2)
    val (rows, worst, maxRead) = measureSkew {
      SimilaritySearch.semanticNearDupPairs(corpus, centroids,
        threshold = 0.9, maxCellSize = 4000).collect()
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((900001L, 900002L)),
      "planted near pair in a normal cell must survive the cap")
    assert(!pairs.exists(p => p._1 < Boiler && p._2 < Boiler),
      "over-cap cell must be dropped, not paired")
    assert(worst <= 4.0,
      f"semantic cell cap must keep stages balanced, saw worst max/mean = $worst%.1f")
    // the surviving ~3000-row clean cell legitimately generates ~4.5M
    // candidate pairs (SemDeDup's within-cell price when nlist is far
    // too small for the corpus — production sizes nlist ≈ √N); the
    // hazard the cap removes is the COLLAPSED cell's 72M-pair blowup,
    // so the bound is an order of magnitude under that while leaving
    // the honest cell's spread-across-tasks reads alone (measured
    // ~140k max)
    assert(maxRead < 5000000,
      s"no task may absorb the collapsed cell's quadratic blowup: max=$maxRead")
    info(f"production semantic cap: worst stage skew $worst%.1fx, max task read $maxRead%,d records")
  }

  test("prototype prune: collapsed-encoder cell costs LINEAR rank work, exact keep counts") {
    val corpus = degenerateEmbeddings
    val centroids = IvfIndex.train(corpus, nlist = 4, iters = 2)
    val (rows, _, maxRead) = measureSkew {
      SimilaritySearch.prototypePrune(corpus, centroids, keepFrac = 0.5)
        .collect()
    }
    // exact per-cell keep counts — the hot cell included: a collapsed
    // cell must be PRUNED at its fraction, not dropped or over-kept
    val keptPerCell = rows.groupBy(_.getInt(1)).view.mapValues(_.size).toMap
    val sizePerCell = IvfIndex.index(corpus, centroids)
      .groupBy(col("cell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    sizePerCell.foreach { case (cell, n) =>
      assert(keptPerCell.getOrElse(cell, 0) == math.ceil(0.5 * n).toLong,
        s"cell $cell: kept ${keptPerCell.getOrElse(cell, 0)} of $n")
    }
    // the hot cell funnels into one window task BY DESIGN — but the
    // cost is LINEAR in cell size (rank), unlike the quadratic pairing
    // semanticNearDupPairs must cap: no task may read more than the
    // corpus itself (the 12k-member cell reads 12k rows, not 72M pairs)
    val corpusN = Boiler + CleanN + 2
    assert(maxRead <= corpusN.toLong,
      s"prune cost must stay linear in the hot cell: max task read $maxRead")
    info(f"prototype prune under collapsed cell: max task read $maxRead%,d records (corpus $corpusN%,d)")
  }

  test("production simhash bucket cap: skew bounded under identical fingerprints") {
    val (rows, worst, maxRead) = measureSkew {
      Dedup.simhashPairs(identicalFingerprintDocs, "doc_id", "text").collect()
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((900001L, 900002L)),
      "planted dup pair in a small bucket must survive the cap")
    // the 12000-member fingerprint bucket is over the cap on EVERY band
    // and is dropped whole (documented: mass-dups go through exact
    // dedup first) — no boiler pair may appear, and no task may have
    // read the degenerate bucket
    assert(!pairs.exists(p => p._1 < Boiler && p._2 < Boiler),
      "over-cap fingerprint bucket must be dropped, not paired")
    assert(worst <= 4.0,
      f"simhash bucket cap must keep stages balanced, saw worst max/mean = $worst%.1f")
    assert(maxRead < Boiler,
      s"no task may read the whole degenerate fingerprint bucket: max=$maxRead")
    info(f"production simhash cap: worst stage skew $worst%.1fx, max task read $maxRead%,d records")
  }

  test("production winnow hot-fingerprint cap: skew bounded under a mass-shared run") {
    // 12000 docs all carrying the SAME 30-token boilerplate run: every
    // selected fingerprint of the run is shared by 12000 docs — 12x
    // over WinnowMaxDocsPerGram — and must be capped out via the
    // partial-agg + broadcast-anti path, never paired and never
    // funneled into one task. A planted pair sharing a DIFFERENT long
    // run (well under the cap) must still be found.
    val s = spark
    import s.implicits._
    val hotRun = (1 to 30).map(i => s"wsk$i").mkString(" ")
    val coldRun = (1 to 30).map(i => s"wpl$i").mkString(" ")
    val boiler = s.range(0, Boiler).select(col("id").as("doc_id"),
      concat(lit(hotRun), lit(" "), md5(col("id").cast("string")), lit(" "),
        md5((col("id") + 1).cast("string"))).as("text"))
    val clean = s.range(100000, 100000L + CleanN).select(col("id").as("doc_id"),
      concat_ws(" ", md5(col("id").cast("string")),
        md5((col("id") * 7 + 1).cast("string")),
        md5((col("id") * 13 + 2).cast("string")),
        md5((col("id") * 31 + 3).cast("string"))).as("text"))
    val planted = Seq(
      (900001L, s"pa pb pc $coldRun pd"),
      (900002L, s"$coldRun qa qb qc")).toDF("doc_id", "text")
    val (rows, worst, maxRead) = measureSkew {
      Dedup.winnowPairs(boiler.union(clean).union(planted),
        "doc_id", "text").collect()
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((900001L, 900002L)),
      "the planted cold-run pair must survive the hot cap")
    assert(!pairs.exists(p => p._1 < Boiler && p._2 < Boiler),
      "hot fingerprints must be capped out, not paired")
    assert(worst <= 4.0,
      f"winnow hot cap must keep stages balanced, saw worst max/mean = $worst%.1f")
    // no absolute maxRead bound here: the per-DOC window stage
    // legitimately carries the corpus's ~400k gram rows uniformly
    // (~12k/task at 32 partitions) — the skew RATIO is the funnel
    // detector; a window-count-style cap would have shown ~32x
    info(f"production winnow cap: worst stage skew $worst%.1fx, max task read $maxRead%,d records")
  }
}
