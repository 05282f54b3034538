package graft.packs

import graft.operators.Materialize.MatOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.NbClassifier

/** Trained-classifier queries over the `documents` table — the
  * supervised quality model at the fastText seam
  * ([[graft.operators.NbClassifier]]): heuristic-labeled Naive-Bayes
  * training whose sufficient statistics are oracle-verified counts,
  * one-pass scan-side inference whose weights embed in the generated
  * oracle via the trained-snapshot pattern, and the persisted
  * count-additive form ([[graft.operators.NbStore]]).
  *
  * Verification closes the whole loop cross-engine:
  * `classifier_model` hash-matches the sufficient statistics (DuckDB
  * recomputes labels + hashed-bucket counts from scratch);
  * `modelOf` — the only step the oracle can't run — is a pure driver
  * function of those verified counts, pinned by [[NbClassifierSpec]];
  * `classifier_score` / `classifier_filter` hash-match inference with
  * the trained weights embedded in the generated SQL; and
  * `classifier_score_store` shares `classifier_score`'s oracle
  * VERBATIM — count additivity means the two-batch store derives the
  * identical model (the `token_count_bpe_store` equivalence argument).
  * `classifier_eval` and `classifier_cutoff` close the MLOps tail:
  * measured per-class agreement, then the balanced-accuracy-optimal
  * operating threshold — audit, calibrate, filter, all oracle-gated.
  * `classifier_score_bigram` / `classifier_eval_bigram` add fastText's
  * actual feature space (hashed unigrams + adjacent word bigrams, one
  * shared bucket space) — the gated eval rows MEASURE the delta
  * (cutoff-0 specificity ~0.20 → ~0.90 on this corpus). The eval/
  * cutoff family consumes ONE shared scored checkpoint (label + both
  * raw scores in a single corpus scan — the curateAudit idiom).
  */
object ClassifierOps extends QueryPack {

  import NbClassifier.{Dim, PosMin, NegMax, Scale}

  /** The sufficient statistics as a relation — training's ONLY
    * data-dependent step, fully recomputable by the oracle. */
  def classifierModel(spark: SparkSession, sfDir: String): DataFrame =
    NbClassifier.stats(Tables.documents(spark, sfDir), "doc_id", "text")

  /** Per-document classifier score under the JVM-cached model trained
    * on this corpus. */
  def classifierScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val m = NbClassifier.trainCached(docs, sfDir, "doc_id", "text")
    docs.select(col("doc_id"),
      NbClassifier.scoreExpr(col("text"), m).as("clf_score"))
  }

  /** Rank agreement between the labeling HEURISTIC and the trained
    * classifier's ordering — the generalization eval: the classifier
    * was trained on the heuristic's extremes (≥ PosMin / ≤ NegMax), so
    * Spearman ρ over the WHOLE corpus measures how faithfully the
    * learned scores interpolate the middle band the labels never saw.
    * Both rank keys are exact integers (quality basis points; raw
    * scaled log-odds), so the histogram-midrank machinery
    * ([[graft.operators.TextAnalysis.rankAgreement]]) never touches a
    * double until the final ρ. */
  def classifierRankAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sfDir)
    val m = NbClassifier.trainCached(docs, sfDir, "doc_id", "text")
    TextAnalysis.rankAgreement(docs.select(col("doc_id"),
      TextAnalysis.qualityBp(col("text")).as("sa"),
      NbClassifier.rawScoreExpr(col("text"), m).as("sb")))
  }

  /** The classifier as a curation gate, audited per language: keep =
    * positive log-odds (an EXACT integer comparison — the rounded
    * score never decides), plus the exact-arithmetic mean score
    * (integer sums unscaled in one division, the repo's
    * re-aggregated-double rule). */
  def classifierFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val m = NbClassifier.trainCached(docs, sfDir, "doc_id", "text")
    val raw = NbClassifier.rawScoreExpr(col("text"), m)
    docs.select(col("lang"), raw.as("raw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("raw") > 0, lit(1L)).otherwise(lit(0L))).as("n_kept"),
        // scaled scores are ~1e10 per doc, so a LongType sum would
        // silently wrap around ~10^9 docs per group while DuckDB's
        // HUGEINT would not — sum as exact DECIMAL in both engines and
        // pay the one well-defined double conversion at the end
        round(sum(col("raw").cast("decimal(30,0)")).cast("double") /
          (count(lit(1)).cast("double") * lit(Scale.toDouble)), 4)
          .as("avg_clf"))
  }

  // One scored+labeled checkpoint per dataset per JVM — the curateAudit
  // idiom at the eval seam (VERDICT r11 "what's wrong 3"): eval, cutoff
  // AND the bigram eval all consume (label, raw, raw_bi), so the
  // regex-heavy label expression and BOTH inference passes run in ONE
  // corpus scan instead of once per consumer. LAZY, per the query-path
  // convention — construction must not run a job. Deliberate tradeoff:
  // a consumer that only needs ONE score column (cutoff) still pays the
  // other model's bounded training fit and per-doc column — amortized
  // across the family in any Verify/Bench run, and the alternative
  // (per-column checkpoints) re-scans the corpus per consumer.
  private val scoredLabeled =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def scoredLabeledOf(spark: SparkSession, sfDir: String): DataFrame =
    // compute (not computeIfAbsent): a cached checkpoint is backed by
    // non-reliable blocks of ITS SparkSession — after a session swap in
    // the same JVM the entry must be rebuilt, not returned stopped
    scoredLabeled.compute(sfDir, (dir, cached) =>
      if (cached != null && (cached.sparkSession eq spark)) cached
      else {
        import graft.operators.TextAnalysis
        val docs = Tables.documents(spark, dir)
        val m = NbClassifier.trainCached(docs, dir, "doc_id", "text")
        val mb = NbClassifier.trainCachedBigram(docs, dir, "doc_id", "text")
        docs.select(
            NbClassifier.labelExpr(TextAnalysis.qualityExpr(col("text")))
              .cast("long").as("label"),
            NbClassifier.rawScoreExpr(col("text"), m).as("raw"),
            NbClassifier.rawScoreBigramExpr(col("text"), mb).as("raw_bi"))
          .filter(col("label").isNotNull)
          .seamCheckpoint(false)
      })

  /** The shared eval rollup: per-class doc and agreement counts over a
    * raw-score column of the checkpointed (label, raw, raw_bi) scan. */
  private def evalOver(scored: DataFrame, rawCol: String): DataFrame = {
    val correct = when((col(rawCol) > 0) === (col("label") === 1), lit(1L))
      .otherwise(lit(0L))
    scored.groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"), sum(correct).as("n_correct"))
      .select(col("label"), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double") /
          col("n_docs").cast("double"), 4).as("acc"))
  }

  /** Measured label agreement per class — the training-accuracy audit
    * a real pipeline tracks per corpus snapshot (a drop signals
    * label/model drift; the ann_recall "measured, not argued"
    * pattern). Decision = the EXACT integer log-odds sign; ambiguous
    * middle docs are excluded, as in training. Consumes the shared
    * scored checkpoint — one corpus scan feeds eval, cutoff and the
    * bigram eval. */
  def classifierEval(spark: SparkSession, sfDir: String): DataFrame =
    evalOver(scoredLabeledOf(spark, sfDir), "raw")

  /** [[classifierEval]] under the unigram+bigram feature space — the
    * row that MEASURES what fastText's bigram bucket buys (or costs)
    * against the unigram baseline, same oracle shape. */
  def classifierEvalBigram(spark: SparkSession, sfDir: String): DataFrame =
    evalOver(scoredLabeledOf(spark, sfDir), "raw_bi")

  /** Per-document score under the unigram+bigram model — fastText's
    * actual feature space at the same one-pass scan-side seam. */
  def classifierScoreBigram(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val m = NbClassifier.trainCachedBigram(docs, sfDir, "doc_id", "text")
    docs.select(col("doc_id"),
      NbClassifier.scoreBigramExpr(col("text"), m).as("clf_score"))
  }

  /** Centi-score clamp bounds for [[classifierCutoff]]'s histogram —
    * a bounded value domain (±20.00 in score units) like the
    * quality-floor's basis-point histogram: the candidate-cutoff
    * relation can never exceed 4001 rows however large the corpus. */
  val CutoffClampC = 2000L

  /** Operating-cutoff selection — the calibration step a trained
    * filter actually ships with: over the labeled docs, pick the
    * cutoff maximizing BALANCED accuracy (mean of recall and
    * specificity — robust to the class imbalance the heuristic labels
    * have), with keep = score > cutoff. The [[classifierEval]] audit
    * at cutoff 0 shows why this exists (recall 1.0 / specificity ~0.2
    * on this corpus — cutoff 0 is far from optimal when classes share
    * vocabulary).
    *
    * Scale shape = the quality-floor design: scores quantize scan-side
    * to a clamped centi-score grid, the histogram is ≤ 4001
    * (label-count) rows, the confusion curve is ONE window over the
    * histogram (never over the corpus), totals broadcast, and the
    * argmax is a bounded sort. Determinism: ranking on the ROUNDED
    * balanced accuracy with cutoff ASC ties (the tfidf
    * round-before-rank idiom). */
  def classifierCutoff(spark: SparkSession, sfDir: String): DataFrame = {
    // centi-score: floor(raw / 1e4) (raw is 1e6-scaled), clamped —
    // floor-of-double-division, not integer division, so negative
    // scores round toward -inf identically in both engines; the
    // (label, raw) source is the shared scored checkpoint (one corpus
    // scan across eval/cutoff/eval_bigram)
    val labeled = scoredLabeledOf(spark, sfDir)
      .select(col("label"),
        greatest(lit(-CutoffClampC), least(lit(CutoffClampC),
          floor(col("raw").cast("double") / lit(10000.0)).cast("long")))
          .as("qc"))
    // materialize the ≤4001-row histogram ONCE: both the totals and
    // the confusion curve consume it, and without the checkpoint each
    // branch would re-scan and re-quantize the whole corpus (the
    // score-once argument, at histogram size). LAZY, per the
    // query-path convention (SimilaritySearch/Dedup) — an eager
    // checkpoint would run the corpus job at DataFrame-CONSTRUCTION
    // time, making even a plan dump pay the scan
    val h = labeled.groupBy(col("qc"))
      .agg(sum(col("label")).as("pos"),
        sum(lit(1L) - col("label")).as("neg"))
      .seamCheckpoint(false)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("qc").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tot = h.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"))
    // keep = qc > cutoff: the strictly-above prefix of the desc-ordered
    // histogram (window excludes the current row)
    val curve = h.select(col("qc").as("cutoff_c"),
        coalesce(sum(col("pos")).over(w), lit(0L)).as("tp"),
        coalesce(sum(col("neg")).over(w), lit(0L)).as("fp"))
      .crossJoin(broadcast(tot))
      .select(col("cutoff_c"), col("tp"),
        (col("n_neg") - col("fp")).as("tn"), col("n_pos"), col("n_neg"),
        round((col("tp").cast("double") / col("n_pos").cast("double") +
          (col("n_neg") - col("fp")).cast("double") /
            col("n_neg").cast("double")) / 2, 4).as("bal_acc"))
    curve.orderBy(col("bal_acc").desc, col("cutoff_c").asc).limit(1)
  }

  private val nbStores = new java.util.concurrent.ConcurrentHashMap[
    String, graft.operators.NbStore]()

  /** Store-backed scoring: the sufficient statistics are ingested in
    * TWO batches (so the gate also proves count additivity — summed
    * partials derive the IDENTICAL model to one-shot training, hence
    * the oracle is classifier_score's verbatim) and the model is
    * derived from the persisted counts. */
  def classifierScoreStore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val store = nbStores.computeIfAbsent(sfDir, dir => {
      val s = new graft.operators.NbStore(
        s"graft_nb_store_${QueryPack.storeSuffix(dir)}")
      s.ingest(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        batchId = 0L)
      s.ingest(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text",
        batchId = 1L)
      s
    })
    val m = store.model(spark)
    docs.select(col("doc_id"),
      NbClassifier.scoreExpr(col("text"), m).as("clf_score"))
  }

  /** The classifier as a curation pipeline's FIRST gate — the
    * composition real pipelines run (trained filter, then mixture,
    * then dedup): positive log-odds keep → stratified mixture →
    * MinHash-LSH near-dup clusters → per-cluster argmax keep on the
    * CLASSIFIER score (where `pipeline_curate_quality` argmaxes the
    * heuristic — the trained model now decides both admission and
    * which near-dup copy is canonical). Output (doc_id, lang,
    * clf_score). */
  def pipelineCurateClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    curateClassifier(docs,
      NbClassifier.trainCached(docs, sfDir, "doc_id", "text"))
  }

  /** [[pipelineCurateClassifier]] over an arbitrary (doc_id, lang,
    * text) corpus under a given model — specs drive it with planted
    * corpora. */
  def curateClassifier(docs: DataFrame,
      m: NbClassifier.Model): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val raw = NbClassifier.rawScoreExpr(col("text"), m)
    val kept = docs.select(col("doc_id"), col("lang"), col("text"),
        NbClassifier.scoreExpr(col("text"), m).as("quality"),
        raw.as("raw"))
      .filter(col("raw") > 0).drop("raw")
    val sampled = TextAnalysis.stratifiedSample(kept, "lang", "doc_id",
      TextOps.SampleRatesBp, TextOps.SampleDefaultBp)
    val clusters = Dedup.nearDupClustersFromPairs(sampled, "doc_id",
      Dedup.minhashLshMd5(sampled, "doc_id", "text"),
      trustedPairs = true)
    val withScore = clusters.select(col("doc_id"), col("cluster_id"))
      .join(sampled.select(col("doc_id"), col("lang"), col("quality")),
        "doc_id")
    Dedup.keepByQuality(withScore, carryCols = Seq("lang"))
      .filter(col("keep"))
      .select(col("doc_id"), col("lang"), col("quality").as("clf_score"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "classifier_model" -> (classifierModel _),
    "classifier_score" -> (classifierScore _),
    "classifier_filter" -> (classifierFilter _),
    "classifier_score_store" -> (classifierScoreStore _),
    "classifier_eval" -> (classifierEval _),
    "classifier_eval_bigram" -> (classifierEvalBigram _),
    "classifier_score_bigram" -> (classifierScoreBigram _),
    "classifier_cutoff" -> (classifierCutoff _),
    "classifier_rank_agreement" -> (classifierRankAgreement _),
    "pipeline_curate_classifier" -> (pipelineCurateClassifier _)
  )

  // ---------------------------------------------------------------- oracles

  /** The shared per-token bucket CTE chain (the embed_text_components
    * md5h60 idiom under the `clf#` salt). */
  private def bucketCtes: String =
    s"""tok AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |), hb AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5('clf#' || t), 1, 15))::BIGINT % $Dim AS bucket
       |  FROM tok
       |)""".stripMargin

  /** The unigram+bigram bucket chain: every token's `clf#` bucket plus
    * every adjacent pair's `clf2#` bucket, one shared $Dim-bucket space
    * (fastText's single hashing space — collisions are part of the
    * model identically in training and inference, both engines). */
  private def bucketBigramCtes: String =
    s"""tok2 AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS toks,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents
       |), hb AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5('clf#' || toks[CAST(i AS INT)]), 1, 15))::BIGINT % $Dim
       |      AS bucket
       |  FROM tok2, unnest(range(1, n + 1)) AS u(i)
       |  UNION ALL
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5('clf2#' || toks[CAST(i AS INT)] || ' ' ||
       |        toks[CAST(i AS INT) + 1]), 1, 15))::BIGINT % $Dim AS bucket
       |  FROM tok2, unnest(range(1, n)) AS u(i)
       |)""".stripMargin

  /** The per-class agreement tail over a `s(doc_id, raw)` scored CTE —
    * shared verbatim by the unigram and bigram eval oracles so the two
    * audits can't drift on anything but the score. */
  private def evalTailSql: String =
    s""",
       |lab AS (
       |  SELECT doc_id,
       |    CASE WHEN q >= ${NbClassifier.PosMin} THEN 1 ELSE 0 END
       |      AS label
       |  FROM (SELECT doc_id, ${TextOps.qualityExprSql} AS q
       |        FROM documents)
       |  WHERE q >= ${NbClassifier.PosMin}
       |     OR q <= ${NbClassifier.NegMax}
       |)
       |SELECT CAST(lab.label AS BIGINT) AS label,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN (s.raw > 0) = (lab.label = 1)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  round(CAST(sum(CASE WHEN (s.raw > 0) = (lab.label = 1)
       |      THEN 1 ELSE 0 END) AS BIGINT)
       |    / CAST(count(*) AS DOUBLE), 4) AS acc
       |FROM lab JOIN s USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** Bigram-model oracles, generated from the exact weights the engine
    * trained ([[NbClassifier.trainedSnapshotBigram]]). */
  private def bigramOracles: Map[String, String] =
    NbClassifier.trainedSnapshotBigram(Dim)
      .filter(_.nonDefault.nonEmpty).toList.flatMap { m =>
        val values = m.nonDefault
          .map { case (b, w) => s"($b, $w)" }.mkString(", ")
        val scored =
          s"""WITH $bucketBigramCtes,
             |w(bucket, wt) AS (VALUES $values),
             |s AS (
             |  SELECT doc_id, min(lang) AS lang,
             |    ${m.biasScaled} +
             |      CAST(sum(COALESCE(w.wt, ${m.defaultScaled})) AS BIGINT) AS raw
             |  FROM hb LEFT JOIN w USING (bucket) GROUP BY doc_id
             |)""".stripMargin
        Seq(
          "classifier_score_bigram" ->
            s"""$scored
               |SELECT doc_id, round(raw / 1000000.0, 4) AS clf_score
               |FROM s""".stripMargin,
          "classifier_eval_bigram" -> (scored + evalTailSql))
      }.toMap

  // generated from the exact weights the engine trained (the
  // BpeTokenizer.trainedSnapshot pattern): available once the query
  // pass has run — always true in Verify's dump order;
  // untrained/ambiguous/degenerate → omitted, falling back to the
  // rows-only check
  /** Full standalone SELECT of the EXACT-INTEGER raw scores —
    * `(doc_id, raw)` — for composed oracles that gate on the integer
    * sign (raw > 0), where the rounded clf_score would drift on
    * 0 < raw < Scale/2·10⁻⁴. Nested as a subquery-scoped CTE body (the
    * gopher_verdict pattern), so its internal names can't collide. */
  private[packs] def rawScoreOracleSql: Option[String] =
    NbClassifier.trainedSnapshot(Dim)
      .filter(_.nonDefault.nonEmpty).map { m =>
        val values = m.nonDefault
          .map { case (b, w) => s"($b, $w)" }.mkString(", ")
        s"""WITH $bucketCtes,
           |w(bucket, wt) AS (VALUES $values),
           |s AS (
           |  SELECT doc_id,
           |    ${m.biasScaled} +
           |      CAST(sum(COALESCE(w.wt, ${m.defaultScaled})) AS BIGINT) AS raw
           |  FROM hb LEFT JOIN w USING (bucket) GROUP BY doc_id
           |)
           |SELECT doc_id, raw FROM s""".stripMargin
      }

  private def scoreOracles: Map[String, String] =
    NbClassifier.trainedSnapshot(Dim)
      .filter(_.nonDefault.nonEmpty).toList.flatMap { m =>
        val values = m.nonDefault
          .map { case (b, w) => s"($b, $w)" }.mkString(", ")
        // raw = bias + Σ bucket weights: exact BIGINT both engines
        // (DuckDB sum(BIGINT) → HUGEINT, hence the cast); COALESCE
        // fills the untouched-bucket default the trained array carries
        val scored =
          s"""WITH $bucketCtes,
             |w(bucket, wt) AS (VALUES $values),
             |s AS (
             |  SELECT doc_id, min(lang) AS lang,
             |    ${m.biasScaled} +
             |      CAST(sum(COALESCE(w.wt, ${m.defaultScaled})) AS BIGINT) AS raw
             |  FROM hb LEFT JOIN w USING (bucket) GROUP BY doc_id
             |)""".stripMargin
        val scoreSql =
          s"""$scored
             |SELECT doc_id, round(raw / 1000000.0, 4) AS clf_score
             |FROM s""".stripMargin
        Seq(
          "classifier_score" -> scoreSql,

          // the store only relocates where the counts come from —
          // summed batch partials derive the identical model, so the
          // oracle is the SAME string
          "classifier_score_store" -> scoreSql,

          "classifier_filter" ->
            s"""$scored
               |SELECT lang, count(*) AS n_docs,
               |  CAST(sum(CASE WHEN raw > 0 THEN 1 ELSE 0 END) AS BIGINT)
               |    AS n_kept,
               |  round(CAST(sum(raw) AS DOUBLE) /
               |    (count(*) * 1000000.0), 4) AS avg_clf
               |FROM s GROUP BY lang""".stripMargin,

          // agreement audit: per-doc raw joined back to the recomputed
          // heuristic labels; decision = exact integer sign, accuracy
          // one division of exact counts (tail shared with the bigram
          // audit — the two can't drift on anything but the score)
          "classifier_eval" -> (scored + evalTailSql),

          // whole-corpus rank agreement vs the labeling heuristic:
          // exact-integer rank keys (quality basis points / raw scaled
          // log-odds) through the shared histogram-midrank Spearman
          // tail
          "classifier_rank_agreement" ->
            s"""$scored,
               |j AS (
               |  SELECT q.doc_id, q.sa, s.raw AS sb
               |  FROM (SELECT doc_id,
               |          CAST(round((${TextOps.qualityExprSql}) * 10000)
               |            AS BIGINT) AS sa
               |        FROM documents) q
               |  JOIN s USING (doc_id)
               |),
               |${TextOps.rankAgreementSqlTail}""".stripMargin,

          // cutoff tuning: the same scored+labels join quantized to the
          // clamped centi grid, confusion curve via ONE window over the
          // ≤4001-row histogram, argmax on the rounded balanced
          // accuracy (cutoff ASC ties)
          "classifier_cutoff" ->
            s"""$scored,
               |lab AS (
               |  SELECT doc_id,
               |    CASE WHEN q >= ${NbClassifier.PosMin} THEN 1 ELSE 0 END
               |      AS label
               |  FROM (SELECT doc_id, ${TextOps.qualityExprSql} AS q
               |        FROM documents)
               |  WHERE q >= ${NbClassifier.PosMin}
               |     OR q <= ${NbClassifier.NegMax}
               |),
               |j AS (
               |  SELECT lab.label,
               |    greatest(-$CutoffClampC, least($CutoffClampC,
               |      CAST(floor(s.raw / 10000.0) AS BIGINT))) AS qc
               |  FROM lab JOIN s USING (doc_id)
               |),
               |h AS (
               |  SELECT qc, CAST(sum(label) AS BIGINT) AS pos,
               |    CAST(sum(1 - label) AS BIGINT) AS neg
               |  FROM j GROUP BY qc
               |),
               |tot AS (
               |  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
               |    CAST(sum(neg) AS BIGINT) AS n_neg
               |  FROM h
               |),
               |curve AS (
               |  SELECT h.qc AS cutoff_c,
               |    CAST(COALESCE(sum(h.pos) OVER (ORDER BY h.qc DESC
               |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               |      AS BIGINT) AS tp,
               |    CAST(COALESCE(sum(h.neg) OVER (ORDER BY h.qc DESC
               |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               |      AS BIGINT) AS fp
               |  FROM h
               |)
               |SELECT c.cutoff_c, c.tp, (t.n_neg - c.fp) AS tn,
               |  t.n_pos, t.n_neg,
               |  round((c.tp / CAST(t.n_pos AS DOUBLE) +
               |    (t.n_neg - c.fp) / CAST(t.n_neg AS DOUBLE)) / 2, 4)
               |    AS bal_acc
               |FROM curve c, tot t
               |ORDER BY bal_acc DESC, cutoff_c ASC
               |LIMIT 1""".stripMargin,

          // the composed pipeline: the scored CTEs feed the SAME
          // sample-gate / minhash-pair / component fragments the
          // standalone oracles verify, then the j/b/k argmax tail of
          // pipeline_curate_quality with the classifier score deciding
          // the canonical (max rounded score, min-id tie-break — the
          // keepByQuality struct-argmax)
          "pipeline_curate_classifier" ->
            s"""WITH RECURSIVE $bucketCtes,
               |w(bucket, wt) AS (VALUES $values),
               |s AS (
               |  SELECT doc_id,
               |    ${m.biasScaled} +
               |      CAST(sum(COALESCE(w.wt, ${m.defaultScaled})) AS BIGINT)
               |      AS raw
               |  FROM hb LEFT JOIN w USING (bucket) GROUP BY doc_id
               |), scored AS (
               |  SELECT d.doc_id, d.lang, d.text, s.raw,
               |    round(s.raw / 1000000.0, 4) AS clf
               |  FROM documents d JOIN s USING (doc_id)
               |), sampled AS (
               |  SELECT * FROM scored
               |  WHERE raw > 0 AND ${TextOps.sampleGateSql}
               |),
               |${DedupOps.minhashMd5PairCtesFrom("sampled")},
               |${DedupOps.componentCtes("sampled",
                   graft.operators.Dedup.NgramThreshold)},
               |j AS (SELECT cc.v AS doc_id, cc.cluster_id, s2.lang, s2.clf
               |      FROM cc JOIN sampled s2 ON cc.v = s2.doc_id),
               |b AS (SELECT cluster_id, max(clf) AS best
               |      FROM j GROUP BY cluster_id),
               |k AS (SELECT j.cluster_id, min(j.doc_id) AS best_id
               |      FROM j JOIN b ON j.cluster_id = b.cluster_id
               |        AND j.clf = b.best
               |      GROUP BY j.cluster_id)
               |SELECT j.doc_id, j.lang, j.clf AS clf_score
               |FROM j JOIN k ON j.cluster_id = k.cluster_id
               |WHERE j.doc_id = k.best_id""".stripMargin
        )
      }.toMap

  override def oracleSql: Map[String, String] = Map(
    // full from-scratch recompute: heuristic labels (the text_quality
    // expression), hashed-bucket token counts per class, and the
    // doc-count sentinel rows — training's entire data dependency
    "classifier_model" ->
      s"""WITH q AS (
         |  SELECT doc_id, text, ${TextOps.qualityExprSql} AS q FROM documents
         |), lab AS (
         |  SELECT text, CASE WHEN q >= $PosMin THEN 1 ELSE 0 END AS label
         |  FROM q WHERE q >= $PosMin OR q <= $NegMax
         |), tok AS (
         |  SELECT label, unnest(string_split(text, ' ')) AS t FROM lab
         |), b AS (
         |  SELECT label,
         |    ('0x' || substr(md5('clf#' || t), 1, 15))::BIGINT % $Dim AS bucket
         |  FROM tok
         |)
         |SELECT CAST(label AS BIGINT) AS label, bucket, count(*) AS c
         |FROM b GROUP BY 1, 2
         |UNION ALL
         |SELECT CAST(label AS BIGINT), ${NbClassifier.DocCountBucket},
         |  count(*)
         |FROM lab GROUP BY 1""".stripMargin
  ) ++ scoreOracles ++ bigramOracles
}
