package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryPack, Tables}
import graft.sql.KsqlSurface

/** The KSQL-comment statements as genuine Spark SQL (SURVEY.md §3.3) —
  * same oracles as their DataFrame twins, but exercising the parse →
  * analyze → optimize lifecycle — plus an extension-operator query
  * written entirely against the registered graft_* SQL functions. */
object SqlSurfaceOps extends QueryPack {

  /** Blocked n-gram Jaccard dedup as pure SQL text over the graft_*
    * native-expression functions (GraftFunctions) — proves the SQL
    * surface of the extension operators end-to-end through the DuckDB
    * gate, against the SAME oracle as the DataFrame twin. The window
    * count mirrors blockedNgramJaccard's maxBlockSize cap. */
  def dedupNgramSql(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Dedup.{NgramMaxBlockSize, NgramPrefixLen, NgramShingleN, NgramThreshold}
    graft.functions.GraftFunctions.register(spark) // idempotent
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH t AS (
         |  SELECT * FROM (
         |    SELECT doc_id, substring(text, 1, $NgramPrefixLen) AS blk,
         |           graft_shingles(text, $NgramShingleN) AS sh,
         |           count(1) OVER (PARTITION BY substring(text, 1, $NgramPrefixLen)) AS blk_n
         |    FROM documents
         |  ) WHERE blk_n <= $NgramMaxBlockSize
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       round(graft_jaccard(a.sh, b.sh), 4) AS jac
         |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE graft_jaccard(a.sh, b.sh) >= $NgramThreshold""".stripMargin)
  }

  /** The training-output layout (shard + concat-and-chunk pack) as pure
    * SQL text — the declarative twin of
    * [[graft.operators.TextAnalysis.packSequences]]: the salted
    * md5-derived shard/order hashes spelled in builtin SQL functions
    * (`conv(substring(md5(..)))` IS the md5h60 idiom), the same fused
    * rank + running-sum window, the same integer `div`/`pmod` sequence
    * arithmetic. Same oracle string as the DataFrame twin. */
  def packSequencesSql(spark: SparkSession, sfDir: String): DataFrame = {
    val ns = TextOps.NumShards
    val b = TextOps.PackBudget
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH s AS (
         |  SELECT doc_id,
         |    pmod(CAST(conv(substring(md5(concat('shard#', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT), $ns) AS shard,
         |    CAST(conv(substring(md5(concat('ord#', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) AS ord,
         |    CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), w AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM s
         |)
         |SELECT doc_id, shard, pos, n_tokens,
         |  CAST((cum - n_tokens) div $b AS BIGINT) AS seq_first,
         |  CAST((cum - 1) div $b AS BIGINT) AS seq_last,
         |  CAST(pmod(cum - n_tokens, $b) AS BIGINT) AS seq_offset
         |FROM w""".stripMargin)
  }

  /** DSIR selection as pure SQL text — the declarative twin of
    * [[graft.operators.TextAnalysis.dsirSelect]]: hashed-ngram buckets
    * via the builtin md5h60 idiom, bigrams via explode(sequence(..))
    * (guarded `WHERE size >= 2` — Spark's sequence(0,-1) DESCENDS, so
    * the unguarded spelling would fabricate grams for 1-token docs),
    * each ln rounded to 6 decimals and differenced as DECIMAL, top-N
    * by (weight DESC, doc_id). Same oracle string as the DataFrame
    * twin. */
  def dsirSelectSql(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextAnalysis.{DsirBuckets => B, DsirTopN => N}
    // r18 (r17-VERDICT item 3 pattern): the model-side CTE serves from
    // the persisted [[graft.operators.DsirStore]] — the SAME folded
    // (bucket, ct, cr) table dsir_select_store probes (counts are
    // additive, so the stored model == the inline model CTE exactly).
    // The old text computed the gram/tf pipeline TWICE (CTE inlining:
    // once for the model fold, once for the scoring join); the scored
    // side still derives tf from raw text in SQL — ranking the corpus
    // is what the query does. Same oracle string as dsir_select.
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    TextOps.dsirStoreFor(spark, sfDir).model(spark)
      .createOrReplaceTempView("graft_dsir_model")
    spark.sql(
      s"""WITH tok AS (
         |  SELECT doc_id, split(text, ' ') AS t
         |  FROM documents
         |), gram AS (
         |  SELECT doc_id, explode(t) AS gram FROM tok
         |  UNION ALL
         |  SELECT doc_id, concat(t[i-1], ' ', t[i]) AS gram
         |  FROM (SELECT doc_id, t, explode(sequence(1, size(t) - 1)) AS i
         |        FROM tok WHERE size(t) >= 2)
         |), tf AS (
         |  SELECT doc_id,
         |    pmod(CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT), $B) AS bucket,
         |    count(1) AS tf
         |  FROM gram GROUP BY 1, 2
         |), tot AS (
         |  SELECT sum(ct) AS nt, sum(cr) AS nr FROM graft_dsir_model
         |), llr AS (
         |  SELECT bucket,
         |    CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + $B AS DOUBLE)), 6) AS DECIMAL(18,6))
         |    - CAST(round(ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + $B AS DOUBLE)), 6) AS DECIMAL(18,6)) AS llr
         |  FROM graft_dsir_model CROSS JOIN tot
         |)
         |SELECT tf.doc_id, round(CAST(sum(tf.tf * l.llr) AS DOUBLE), 4) AS weight
         |FROM tf JOIN llr l ON tf.bucket = l.bucket
         |GROUP BY tf.doc_id
         |ORDER BY weight DESC, doc_id ASC LIMIT $N""".stripMargin)
  }

  /** The per-language corpus-relative quality floor as pure SQL text —
    * the declarative twin of
    * [[graft.operators.TextAnalysis.qualityFloorByGroup]]: the quality
    * score spelled in builtin functions (the same lambda-filter /
    * regexp arithmetic the Column form lowers to), the bounded
    * (lang, quality_bp) histogram, the per-lang cumulative window and
    * the boundary-tie keep. Same oracle string as the DataFrame twin,
    * so the two surfaces cannot drift. */
  def qualityFloorByLangSql(spark: SparkSession, sfDir: String): DataFrame = {
    val frac = TextOps.QualityFloorFrac
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH q AS (
         |  SELECT doc_id, lang,
         |    CAST(round(round(
         |      least(1.0D, size(split(text, ' ')) / 200.0D) * 0.4D +
         |      (CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS DOUBLE)
         |        / length(text)) * 0.4D +
         |      least(0.2D, CAST(size(filter(split(text, ' '),
         |          t -> array_contains(array('the','a','of','and','to','in','is'), t))) AS DOUBLE)
         |        / size(split(text, ' '))), 4) * 10000) AS BIGINT) AS quality_bp
         |  FROM documents
         |), h AS (
         |  SELECT lang, quality_bp, count(1) AS c FROM q GROUP BY lang, quality_bp
         |), n AS (
         |  SELECT lang, sum(c) AS n FROM h GROUP BY lang
         |), cum AS (
         |  SELECT lang, quality_bp,
         |    sum(c) OVER (PARTITION BY lang ORDER BY quality_bp DESC
         |                 ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM h
         |), cut AS (
         |  SELECT cum.lang, max(quality_bp) AS cutoff
         |  FROM cum JOIN n USING (lang)
         |  WHERE cum.cum >= ceil(n.n * $frac)
         |  GROUP BY cum.lang
         |)
         |SELECT q.doc_id, q.lang, q.quality_bp
         |FROM q JOIN cut USING (lang)
         |WHERE q.quality_bp >= cut.cutoff""".stripMargin)
  }

  /** BM25 as pure Spark SQL text — the declarative twin of
    * [[graft.operators.TextAnalysis.bm25Search]]: same query VALUES,
    * same round-6 idf / round-4 score, the same parenthesization; the
    * Scala-derived constants interpolate via toString (shortest-repr
    * round-trip, so the parsed doubles are bit-identical to the
    * DataFrame twin's lits). Same oracle string as bm25_search. */
  def bm25SearchSql(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextAnalysis.{Bm25B, Bm25K1, Bm25TopK}
    val vals = TextOps.Bm25Queries
      .map { case (q, t) => s"(${q}L, '$t')" }.mkString(", ")
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH qt AS (SELECT * FROM VALUES $vals AS qt(query_id, term)),
         |tok AS (SELECT doc_id, explode(split(text, ' ')) AS term
         |        FROM documents),
         |dl AS (SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS dl
         |       FROM documents),
         |st AS (SELECT CAST(count(1) AS BIGINT) AS n_docs,
         |              CAST(sum(dl) AS DOUBLE) / count(1) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(count(1) AS BIGINT) AS tf
         |       FROM tok WHERE term IN (SELECT DISTINCT term FROM qt)
         |       GROUP BY doc_id, term),
         |df AS (SELECT term, CAST(count(1) AS BIGINT) AS df
         |       FROM tf GROUP BY term),
         |c AS (
         |  SELECT q.query_id, t.doc_id,
         |    round(ln(1.0D + (s.n_docs - d.df + 0.5D) / (d.df + 0.5D)), 6)
         |      * (t.tf * ${Bm25K1 + 1.0}D)
         |      / (t.tf + ${Bm25K1}D * (${1.0 - Bm25B}D + ${Bm25B}D * l.dl / s.avgdl)) AS c
         |  FROM qt q JOIN tf t USING (term) JOIN df d USING (term)
         |  JOIN dl l ON l.doc_id = t.doc_id CROSS JOIN st s
         |),
         |sc AS (SELECT query_id, doc_id, round(sum(c), 4) AS score
         |       FROM c GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, score, rk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
         |  FROM sc)
         |WHERE rk <= $Bm25TopK""".stripMargin)
  }

  /** Scale-safe grouped quantiles as pure SQL text — the declarative
    * twin of [[RelationalOps.percentilesApprox]]: the same
    * approx_percentile sketch call, the same exact-side rank window
    * ([p49, p51] / [p94, p96]) the claim booleans are checked against,
    * the same accuracy constant. Same oracle string as the DataFrame
    * twin (exact side cross-engine verified, claims as TRUE literals). */
  def percentilesApproxSql(spark: SparkSession, sfDir: String): DataFrame = {
    val acc = RelationalOps.ApproxPctAccuracy
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    spark.sql(
      s"""WITH j AS (
         |  SELECT c_mktsegment, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |), a AS (
         |  SELECT c_mktsegment,
         |    approx_percentile(cents, array(0.5D, 0.95D), $acc) AS ap,
         |    percentile(cents, array(0.49D, 0.5D, 0.51D, 0.94D, 0.95D, 0.96D)) AS ex,
         |    count(1) AS n
         |  FROM j GROUP BY c_mktsegment
         |)
         |SELECT c_mktsegment,
         |  round(ex[1], 2) AS p50_cents,
         |  round(ex[4], 2) AS p95_cents,
         |  (ap[0] >= floor(ex[0]) AND ap[0] <= ceil(ex[2])) AS p50_within_rank_1pct,
         |  (ap[1] >= floor(ex[3]) AND ap[1] <= ceil(ex[5])) AS p95_within_rank_1pct,
         |  n
         |FROM a""".stripMargin)
  }

  /** Hybrid RRF retrieval as pure SQL text — the declarative twin of
    * [[TextOps.hybridSearchRrf]]: the bm25 lexical side spelled as in
    * [[bm25SearchSql]], the dense side's HashEmbed vectors derived in
    * builtin functions (the md5h60 idiom over 'emb#'-salted terms —
    * bucket = h % dim, sign = (h div dim) % 2, the exact arithmetic
    * the native expression and the generated oracle share), cosine
    * over the SPARSE bucket join (products of exact-integer component
    * sums — order-independent; zero-overlap pairs kept via the
    * query×doc cross so a 0.0 similarity still outranks a negative
    * one), and the exact 1/(60+rk) fusion tail. Same oracle string as
    * both DataFrame forms. */
  def hybridSearchRrfSql(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextAnalysis.{Bm25B, Bm25K1, Bm25TopK}
    import TextOps.{EmbedDim, HybridQidOffset, RrfK}
    val vals = TextOps.Bm25Queries
      .map { case (q, t) => s"(${q}L, '$t')" }.mkString(", ")
    val hq = TextOps.HybridQueryTexts
      .map { case (q, t) => s"(${q + HybridQidOffset}L, '$t')" }.mkString(", ")
    // r18 (r17-VERDICT item 3): the SQL twin SERVES from the same two
    // persisted stores its DataFrame sibling (hybrid_search_rrf_store)
    // probes, registered as temp views — the statement still runs the
    // full parse → analyze → optimize lifecycle, but its seen-side CTEs
    // are store scans instead of 20 re-tokenizations/re-embeddings of
    // the corpus (the old text re-derived postings AND doc vectors
    // inline; CTE inlining re-ran them per consumer). Query-side
    // embeddings stay derived in SQL (the md5h60 idiom — 3 tiny texts).
    // Same oracle string as every hybrid form; the scoring formulas
    // are bm25FromPostings / bruteForceTopKHeapPrenormed spelled in
    // SQL over the stored columns.
    TextOps.servingLexStore(spark, sfDir).table(spark)
      .createOrReplaceTempView("graft_hyb_postings")
    TextOps.hybridEmbStore(spark, sfDir).vectorRows(spark)
      .createOrReplaceTempView("graft_hyb_vectors")
    spark.sql(
      s"""WITH qt AS (SELECT * FROM VALUES $vals AS qt(query_id, term)),
         |dl AS (SELECT doc_id, min(dl) AS dl FROM graft_hyb_postings
         |       GROUP BY doc_id),
         |st AS (SELECT CAST(count(1) AS BIGINT) AS n_docs,
         |              CAST(sum(dl) AS DOUBLE) / count(1) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, tf, dl FROM graft_hyb_postings
         |       WHERE term IN (SELECT DISTINCT term FROM qt)),
         |df AS (SELECT term, CAST(count(1) AS BIGINT) AS df
         |       FROM tf GROUP BY term),
         |c AS (
         |  SELECT q.query_id, t.doc_id,
         |    round(ln(1.0D + (s.n_docs - d.df + 0.5D) / (d.df + 0.5D)), 6)
         |      * (t.tf * ${Bm25K1 + 1.0}D)
         |      / (t.tf + ${Bm25K1}D * (${1.0 - Bm25B}D + ${Bm25B}D * t.dl / s.avgdl)) AS c
         |  FROM qt q JOIN tf t USING (term) JOIN df d USING (term)
         |  CROSS JOIN st s
         |),
         |sc AS (SELECT query_id, doc_id, round(sum(c), 4) AS score
         |       FROM c GROUP BY query_id, doc_id),
         |lex AS (SELECT query_id, doc_id, rk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
         |  FROM sc) WHERE rk <= $Bm25TopK),
         |hqt AS (SELECT * FROM VALUES $hq AS hqt(query_id, qtext)),
         |hh AS (SELECT vid,
         |         CAST(conv(substring(md5(concat('emb#', t)), 1, 15), 16, 10) AS BIGINT) AS h
         |       FROM (SELECT query_id AS vid, explode(split(qtext, ' ')) AS t
         |             FROM hqt)),
         |qtb AS (SELECT vid, pmod(h, $EmbedDim) AS b,
         |          CAST(sum(CASE WHEN pmod(h div $EmbedDim, 2) = 0
         |                        THEN 1 ELSE -1 END) AS DOUBLE) AS v
         |        FROM hh GROUP BY 1, 2),
         |qn AS (SELECT vid, sqrt(sum(v * v)) AS nrm FROM qtb GROUP BY vid),
         |hdot AS (SELECT q.vid AS qvid, d.vec_id AS dvid,
         |           sum(q.v * element_at(d.emb, CAST(q.b + 1 AS INT))) AS dot
         |         FROM qtb q CROSS JOIN graft_hyb_vectors d
         |         GROUP BY 1, 2),
         |hscored AS (
         |  SELECT h.qvid AS query_id, h.dvid AS vec_id,
         |    round(CASE WHEN qn.nrm * d.nrm = 0D THEN 0D
         |          ELSE h.dot / (qn.nrm * d.nrm) END, 4) AS sim
         |  FROM hdot h
         |  JOIN qn ON qn.vid = h.qvid
         |  JOIN graft_hyb_vectors d ON d.vec_id = h.dvid),
         |hdense AS (
         |  SELECT query_id - ${HybridQidOffset}L AS query_id,
         |         vec_id AS doc_id, rk FROM (
         |    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rk
         |    FROM hscored) WHERE rk <= $Bm25TopK),
         |hall AS (SELECT query_id, doc_id, rk FROM lex
         |         UNION ALL
         |         SELECT query_id, doc_id, rk FROM hdense),
         |hfused AS (SELECT query_id, doc_id,
         |             round(sum(1.0D / ($RrfK + rk)), 4) AS rrf
         |           FROM hall GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, rrf, rk FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rk
         |  FROM hfused) WHERE rk <= $Bm25TopK""".stripMargin)
  }

  /** C4's banned-words page rule as pure SQL text — the declarative
    * twin of [[TextOps.blocklistTag]]: per distinct phrase length one
    * gram block (transform(sequence) over the token split, builtin
    * functions only), the dictionary as an inline VALUES relation.
    * Same oracle string as the DataFrame twin — both sides AND this
    * SQL are generated from the one phrase list. */
  def blocklistTagSql(spark: SparkSession, sfDir: String): DataFrame = {
    val phrases = graft.operators.Blocklist.DefaultPhrases
    // ONE escaping + fold-case seam with the DuckDB oracle generator
    // (Blocklist.sqlDictRows): the lower() wrap evaluates inside
    // Spark here, inside DuckDB there — each engine normalizes with
    // its own table, exactly like the text side
    val dictRows = graft.operators.Blocklist.sqlDictRows(phrases)
    val lens = phrases.map(_.split(" ").length).distinct.sorted
    val gramBlocks = lens.map { k =>
      s"""  SELECT doc_id, $k AS k,
         |    explode(transform(sequence(1, size(t) - $k + 1),
         |      i -> array_join(slice(t, i, $k), ' '))) AS gram
         |  FROM toks WHERE size(t) >= $k""".stripMargin
    }.mkString("\n  UNION ALL\n")
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH dict AS (SELECT * FROM VALUES $dictRows AS d(term, k)),
         |toks AS (SELECT doc_id, split(lower(text), ' ') AS t
         |         FROM documents),
         |grams AS (
         |$gramBlocks
         |), hits AS (
         |  SELECT g.doc_id, d.term, count(1) AS hits
         |  FROM grams g JOIN dict d ON g.gram = d.term AND g.k = d.k
         |  GROUP BY 1, 2
         |), perdoc AS (
         |  SELECT doc_id,
         |    array_join(array_sort(collect_list(term)), ',') AS terms_csv,
         |    sum(hits) AS n_hits
         |  FROM hits GROUP BY doc_id
         |)
         |SELECT d.doc_id, coalesce(p.terms_csv, '') AS terms_csv,
         |       coalesce(p.n_hits, 0L) AS n_hits,
         |       coalesce(p.n_hits, 0L) = 0 AS keep
         |FROM documents d LEFT JOIN perdoc p USING (doc_id)""".stripMargin)
  }

  /** The JS drift monitor as pure SQL text — the declarative twin of
    * [[TextOps.driftVsCorpus]]: the same double-first log-ratio terms,
    * round-6 DECIMAL carry, integer-count weighting and single final
    * division. Same oracle string as both DataFrame forms. */
  def driftVsCorpusSql(spark: SparkSession, sfDir: String): DataFrame = {
    val mod = TextOps.TextIncrementalBatchMod
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH bw AS (
         |  SELECT word, count(1) AS b
         |  FROM (SELECT explode(split(text, ' ')) AS word
         |        FROM documents WHERE doc_id % $mod = 0)
         |  GROUP BY word
         |), sw AS (
         |  SELECT word, count(1) AS s
         |  FROM (SELECT explode(split(text, ' ')) AS word
         |        FROM documents WHERE doc_id % $mod != 0)
         |  GROUP BY word
         |), j AS (
         |  SELECT coalesce(b, 0L) AS b, coalesce(s, 0L) AS s
         |  FROM bw FULL OUTER JOIN sw USING (word)
         |), tot AS (
         |  SELECT sum(b) AS nb, sum(s) AS ns FROM j
         |), t AS (
         |  SELECT b, s, nb, ns,
         |    CASE WHEN b > 0 THEN CAST(round(ln(
         |      CAST(b AS DOUBLE) * CAST(ns AS DOUBLE) * 2 /
         |      (CAST(b AS DOUBLE) * CAST(ns AS DOUBLE) +
         |       CAST(s AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
         |      AS DECIMAL(18,6)) END AS lp,
         |    CASE WHEN s > 0 THEN CAST(round(ln(
         |      CAST(s AS DOUBLE) * CAST(nb AS DOUBLE) * 2 /
         |      (CAST(b AS DOUBLE) * CAST(ns AS DOUBLE) +
         |       CAST(s AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
         |      AS DECIMAL(18,6)) END AS lq
         |  FROM j CROSS JOIN tot
         |)
         |SELECT any_value(nb) AS n_batch_tokens,
         |  any_value(ns) AS n_seen_tokens,
         |  round((CAST(sum(b * lp) AS DOUBLE) / any_value(nb) +
         |         CAST(sum(s * lq) AS DOUBLE) / any_value(ns)) / 2, 4)
         |    AS js_nats
         |FROM t
         |HAVING any_value(nb) > 0 AND any_value(ns) > 0""".stripMargin)
  }

  /** The per-source drift monitor as pure SQL text — same formula as
    * [[driftVsCorpusSql]] grouped by source, with the within-source
    * stride split (the corpus round-robins source over doc_id, so a
    * plain mod split would leave nothing to compare — see
    * [[TextOps.driftBySource]]). Same oracle string as the DataFrame
    * form. */
  def driftBySourceSql(spark: SparkSession, sfDir: String): DataFrame = {
    val mod = TextOps.TextIncrementalBatchMod
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    spark.sql(
      s"""WITH bw AS (
         |  SELECT source AS grp, word, count(1) AS b
         |  FROM (SELECT source, explode(split(text, ' ')) AS word
         |        FROM documents WHERE (doc_id div 20) % $mod = 0)
         |  GROUP BY grp, word
         |), sw AS (
         |  SELECT source AS grp, word, count(1) AS s
         |  FROM (SELECT source, explode(split(text, ' ')) AS word
         |        FROM documents WHERE (doc_id div 20) % $mod != 0)
         |  GROUP BY grp, word
         |), j AS (
         |  SELECT grp, word, coalesce(b, 0L) AS b, coalesce(s, 0L) AS s
         |  FROM bw FULL OUTER JOIN sw USING (grp, word)
         |), tot AS (
         |  SELECT grp, sum(b) AS nb, sum(s) AS ns FROM j
         |  GROUP BY grp HAVING sum(b) > 0 AND sum(s) > 0
         |), t AS (
         |  SELECT j.grp, b, s, nb, ns,
         |    CASE WHEN b > 0 THEN CAST(round(ln(
         |      CAST(b AS DOUBLE) * CAST(ns AS DOUBLE) * 2 /
         |      (CAST(b AS DOUBLE) * CAST(ns AS DOUBLE) +
         |       CAST(s AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
         |      AS DECIMAL(18,6)) END AS lp,
         |    CASE WHEN s > 0 THEN CAST(round(ln(
         |      CAST(s AS DOUBLE) * CAST(nb AS DOUBLE) * 2 /
         |      (CAST(b AS DOUBLE) * CAST(ns AS DOUBLE) +
         |       CAST(s AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
         |      AS DECIMAL(18,6)) END AS lq
         |  FROM j JOIN tot USING (grp)
         |)
         |SELECT grp AS source,
         |  any_value(nb) AS n_batch_tokens,
         |  any_value(ns) AS n_seen_tokens,
         |  round((CAST(sum(b * lp) AS DOUBLE) / any_value(nb) +
         |         CAST(sum(s * lq) AS DOUBLE) / any_value(ns)) / 2, 4)
         |    AS js_nats
         |FROM t GROUP BY grp""".stripMargin)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_windowed_avg" -> (KsqlSurface.windowedAvgSql _),
    "sql_ads_with_clicks" -> (KsqlSurface.adsWithClicksSql _),
    "sql_ctr" -> (KsqlSurface.ctrSql _),
    "sql_dedup_ngram" -> (dedupNgramSql _),
    "sql_pack_sequences" -> (packSequencesSql _),
    "sql_dsir_select" -> (dsirSelectSql _),
    "sql_quality_floor_by_lang" -> (qualityFloorByLangSql _),
    "sql_bm25_search" -> (bm25SearchSql _),
    "sql_percentiles_approx" -> (percentilesApproxSql _),
    "sql_hybrid_search_rrf" -> (hybridSearchRrfSql _),
    "sql_blocklist_tag" -> (blocklistTagSql _),
    "sql_drift_vs_corpus" -> (driftVsCorpusSql _),
    "sql_drift_by_source" -> (driftBySourceSql _)
  )

  // The SQL-text queries verify against the SAME oracle strings as
  // their DataFrame twins (shared in ReferencePipelines) — one spec.
  override def oracleSql: Map[String, String] = Map(
    "sql_windowed_avg" -> ReferencePipelines.windowedAvgOracle,

    "sql_ads_with_clicks" -> ReferencePipelines.ctrJoinOracle,

    "sql_ctr" -> (ReferencePipelines.ctrCountsCtes +
      s"""
         |SELECT ad_id, num_impressions, num_clicks,
         |${ReferencePipelines.ctrFaithfulSelect}
         |FROM counts""".stripMargin),

    "sql_dedup_ngram" -> DedupOps.ngramJaccardOracle,

    "sql_bm25_search" -> TextOps.bm25OracleForSqlTwin,

    "sql_pack_sequences" -> TextOps.oracleSql("pack_sequences"),

    "sql_dsir_select" -> TextOps.oracleSql("dsir_select"),

    "sql_quality_floor_by_lang" -> TextOps.oracleSql("quality_floor_by_lang"),

    "sql_percentiles_approx" -> RelationalOps.oracleSql("percentiles_approx"),

    "sql_hybrid_search_rrf" -> TextOps.oracleSql("hybrid_search_rrf"),

    "sql_blocklist_tag" -> TextOps.oracleSql("blocklist_tag"),

    "sql_drift_vs_corpus" -> TextOps.oracleSql("drift_vs_corpus"),

    "sql_drift_by_source" -> TextOps.oracleSql("drift_by_source")
  )
}
