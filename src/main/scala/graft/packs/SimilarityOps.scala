package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.operators.SimilaritySearch

/** Similarity-search queries over the embeddings table. The brute-force
  * top-k and threshold pair search have full DuckDB oracles (identical
  * index-ordered double math + post-round ranking). The LSH queries are
  * oracled too: the hyperplanes are seeded deterministic doubles, so
  * the generated oracle SQL embeds the full plane matrix as list
  * literals and recomputes the sign buckets in DuckDB — same dot
  * ordering, same strict > 0 test, same bucket join. Recall vs brute
  * force is additionally asserted in SimilaritySearchSpec.
  */
object SimilarityOps extends QueryPack {

  private def queriesDf(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  def annBrute(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.bruteForceTopK(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  def annLsh(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.lshTopK(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  /** Same result as ann_brute through the bounded-heap aggregate —
    * registered against the SAME oracle to prove bit-identity. */
  def annTopkAgg(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.bruteForceTopKHeap(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  /** Int8-quantized brute force — integer dot products over 4×-smaller
    * codes; the quantized-cosine scales cancel so the score is exact
    * cross-engine integer arithmetic. */
  def annBruteInt8(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.bruteForceTopKInt8(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    graft.operators.IvfIndex.topK(vectors, queriesDf(spark, sfDir), centroids,
      k = 10, nprobe = 4)
  }

  // train once per (dataset, params) per JVM — verify/bench re-execute
  // each query; retraining the quantizer per execution is a scale-killer
  private def ivfCentroids(vectors: DataFrame, sfDir: String): Seq[Seq[Double]] =
    graft.operators.IvfIndex.trainCached(
      vectors, datasetKey = sfDir, nlist = 16, iters = 2)

  // One persisted inverted file per dataset per JVM: verify/bench
  // execute each registered query several times, and the store is the
  // ingest-time artifact the probe form exists to amortize — build it
  // once, probe it per execution. Same immutable-dataset-per-JVM
  // assumption as IvfIndex.trainCached; the table name carries the
  // dataset hash so different SF dirs in one JVM get distinct tables.
  private val ivfStores = new java.util.concurrent.ConcurrentHashMap[
    String, graft.operators.IvfStore]()

  /** Store-backed IVF ANN: probes the PERSISTED cell-assigned inverted
    * file ([[graft.operators.IvfStore]]) instead of re-assigning the
    * corpus per query batch — the 100 TB serving form of ann_ivf,
    * under the IDENTICAL oracle (the probe must return exactly the
    * same top-k). The probe never runs an assignment stage over the
    * corpus (IvfStoreSpec pins that plan). */
  private def ivfStoreFor(spark: SparkSession, sfDir: String,
      vectors: DataFrame, centroids: Seq[Seq[Double]]): graft.operators.IvfStore =
    ivfStores.computeIfAbsent(sfDir, dir => {
      val s = new graft.operators.IvfStore(
        s"graft_ivf_store_${graft.QueryPack.storeSuffix(dir)}")
      s.merge(graft.operators.IvfIndex.index(vectors, centroids))
      s
    })

  def annIvfStore(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    val store = ivfStoreFor(spark, sfDir, vectors, centroids)
    graft.operators.IvfIndex.topKFromIndexed(store.table(spark),
      queriesDf(spark, sfDir), centroids, k = 10, nprobe = 4)
  }

  /** SemDeDup self-dedup pairs: IVF-cell-blocked cosine near-dups over
    * the whole embeddings table — the ANN quantizer doubling as the
    * dedup blocker (one trained artifact, two uses). */
  def semanticNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    SimilaritySearch.semanticNearDupPairs(vectors,
      ivfCentroids(vectors, sfDir), threshold = 0.4)
  }

  /** SemDeDup survivors: drop every vector with a SMALLER-id semantic
    * near-duplicate (the deterministic keep-one-representative policy —
    * same canonical-min-id convention as exact dedup). LEFT ANTI on the
    * pair set's greater ids: |pairs| rows against the corpus, no
    * windows, no per-cluster funnel. */
  def semanticDedupKeep(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val pairs = SimilaritySearch.semanticNearDupPairs(vectors,
      ivfCentroids(vectors, sfDir), threshold = 0.4)
    vectors.select(col("vec_id"))
      .join(pairs.select(col("vec_b").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
  }

  /** SemDeDup's published keep policy: within each cluster keep the
    * example FARTHEST from its cell centroid (see
    * [[SimilaritySearch.semanticDedupKeepFarthest]]). */
  def semanticDedupKeepFar(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    SimilaritySearch.semanticDedupKeepFarthest(vectors,
      ivfCentroids(vectors, sfDir), threshold = 0.4)
  }

  /** Store-backed incremental SemDeDup: the batch (vec_id % 5 = 0) is
    * cell-assigned scan-side and probed against the SAME persisted
    * inverted file ann_ivf_store serves from — dedup-at-ingest reads
    * the seen corpus's (emb, v_nrm, cell) rows as a bare bucketed
    * scan, zero seen-side recompute. The seen view excludes the
    * batch's own ids (the ingest-loop replay-exact convention), so
    * output ≡ the full pair set restricted to pairs touching the
    * batch — the oracle is the self-dedup SQL plus one predicate. */
  def semanticNearDupIncrementalStore(spark: SparkSession,
      sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    val store = ivfStoreFor(spark, sfDir, vectors, centroids)
    val batch = vectors.filter(col("vec_id") % EmbIncrementalBatchMod === 0)
    val seen = store.table(spark)
      .filter(col("vec_id") % EmbIncrementalBatchMod =!= 0)
    SimilaritySearch.incrementalSemanticNearDupPairsFromStore(
      batch, seen, centroids, threshold = 0.4)
  }

  /** IVF-PQ ANN: product-quantized codes (8 subspaces × 16 codes —
    * ~64× smaller corpus side) ADC-scored inside the probed IVF
    * cells. Same quantizer as ann_ivf; codebooks trained once per
    * JVM on the same bounded deterministic draw. */
  def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    val codebooks = graft.operators.IvfPq.trainCodebooksCached(
      vectors, datasetKey = sfDir, m = 8, ksub = 16, iters = 2)
    graft.operators.IvfPq.topK(vectors, queriesDf(spark, sfDir),
      centroids, codebooks, k = 10, nprobe = 4)
  }

  private val ivfPqStores = new java.util.concurrent.ConcurrentHashMap[
    String, graft.operators.IvfPqStore]()

  /** Store-backed IVF-PQ: probes the PERSISTED compressed inverted
    * file ([[graft.operators.IvfPqStore]]) — assignment AND encoding
    * paid once at ingest, the probe reads codes+norms only. IDENTICAL
    * oracle to ann_ivfpq: the store only moves where codes come from. */
  private def ivfPqStoreFor(sfDir: String, vectors: DataFrame,
      centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]]): graft.operators.IvfPqStore =
    ivfPqStores.computeIfAbsent(sfDir, dir => {
      val s = new graft.operators.IvfPqStore(
        s"graft_ivfpq_store_${graft.QueryPack.storeSuffix(dir)}")
      s.merge(graft.operators.IvfPq.encode(vectors, centroids, codebooks))
      s
    })

  def annIvfPqStore(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    val codebooks = graft.operators.IvfPq.trainCodebooksCached(
      vectors, datasetKey = sfDir, m = 8, ksub = 16, iters = 2)
    val store = ivfPqStoreFor(sfDir, vectors, centroids, codebooks)
    graft.operators.IvfPq.topKFromEncoded(store.table(spark),
      queriesDf(spark, sfDir), centroids, codebooks, k = 10, nprobe = 4)
  }

  /** PQ shortlist + exact refine across BOTH persisted artifacts: the
    * compressed file narrows (codes only — the memory-bandwidth win),
    * the raw inverted file re-ranks the |queries|·shortlist survivors
    * exactly (point-lookup volume, not a scan). */
  def annIvfPqRefine(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    val codebooks = graft.operators.IvfPq.trainCodebooksCached(
      vectors, datasetKey = sfDir, m = 8, ksub = 16, iters = 2)
    val pqStore = ivfPqStoreFor(sfDir, vectors, centroids, codebooks)
    val rawStore = ivfStoreFor(spark, sfDir, vectors, centroids)
    graft.operators.IvfPq.topKRefined(pqStore.table(spark),
      rawStore.table(spark), queriesDf(spark, sfDir), centroids, codebooks,
      k = 10, shortlist = 30, nprobe = 4)
  }

  /** Residual IVF-PQ (faiss by_residual=true): codes quantize
    * v − centroid[cell], the probe adds the centroid dot back —
    * the canonical compressed-index form. */
  def annIvfPqRes(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    val codebooks = graft.operators.IvfPq.trainResidualCodebooksCached(
      vectors, datasetKey = sfDir, centroids, m = 8, ksub = 16, iters = 2)
    graft.operators.IvfPq.topKResidual(vectors, queriesDf(spark, sfDir),
      centroids, codebooks, k = 10, nprobe = 4)
  }

  /** Binary-quantization ANN: 64 sign bits per vector, integer
    * XOR+popcount ranking — no float accumulation anywhere, so the
    * oracle is exact by construction. */
  def annHamming(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.bruteForceTopKHamming(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      queriesDf(spark, sfDir), k = 10)

  /** Hard-negative mining over the labeled embeddings: per query, the
    * top-10 nearest DIFFERENT-label vectors
    * ([[SimilaritySearch.hardNegativesTopK]]). */
  def annHardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label")
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    SimilaritySearch.hardNegativesTopK(emb, q, k = 10)
  }

  /** Recall@k of the IVF index against brute-force ground truth — the
    * standard ANN quality gauge (faiss benchmarks report exactly this),
    * run as a QUERY so index quality is monitored continuously: per
    * query vector, how many of the exact top-k the nprobe-bounded
    * probe returned. Scale shape: both inputs are top-k OUTPUTS
    * (|queries|·k rows — the corpus never appears), the join is on
    * (query_id, vec_id), and the per-query hit count is one partial
    * agg. Drops in recall → retrain/rebuild ([[graft.operators.IvfStore]]
    * .rebuild). In production the brute side runs over a SAMPLE of
    * queries; here every registered query vector is checked. */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val brute = annBrute(spark, sfDir).select(col("query_id"), col("vec_id"))
    val ivf = annIvf(spark, sfDir)
      .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1L))
    brute.join(ivf, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        round(col("hits").cast("double") / 10.0, 4).as("recall"))
  }

  /** Ranking-quality metrics of the IVF probe against brute-force
    * ground truth — MRR@10 (reciprocal rank of the first relevant
    * result) and binary-relevance NDCG@10 per query, the two numbers a
    * retrieval eval reports beyond recall (rank POSITION matters for
    * RAG context windows: a relevant doc at rank 9 is worth less than
    * at rank 1, which recall@k can't see). Relevance = membership in
    * the exact top-10; IDCG is computed from the brute side's own
    * ranks so short ground-truth lists stay normalized. Scale shape:
    * both inputs are top-k OUTPUTS (|queries|·k rows), one equi-join,
    * two partial aggs — the corpus never appears. */
  def annRankMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val brute = annBrute(spark, sfDir)
      .select(col("query_id"), col("vec_id"), col("rk"))
    val ivf = annIvf(spark, sfDir)
      .select(col("query_id"), col("vec_id"), col("rk").as("irk"))
    val idcg = brute.groupBy(col("query_id"))
      .agg(sum(lit(1.0) / log2(col("rk") + 1)).as("idcg"))
    val rel = brute.select(col("query_id"), col("vec_id"))
      .join(ivf, Seq("query_id", "vec_id"))
    val per = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"),
        sum(lit(1.0) / log2(col("irk") + 1)).as("dcg"),
        min(col("irk")).as("min_rk"))
    idcg.join(per, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(lit(1.0) / col("min_rk"), lit(0.0)), 4).as("mrr"),
        round(coalesce(col("dcg") / col("idcg"), lit(0.0)), 4).as("ndcg"))
  }

  /** PCA component count — shared with the generated oracle and the
    * recall monitor (compare against ann_dim_curve's d=8 truncation
    * row: same budget, trained vs arbitrary subspace). */
  val PcaK = 8

  private def pcaModelFor(spark: SparkSession, sfDir: String) =
    graft.operators.Pca.trainCached(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      sfDir, PcaK)

  /** PCA projection of every embedding onto the trained top-[[PcaK]]
    * components ([[graft.operators.Pca]]): (vec_id, comp, val) —
    * the compressed-representation table a whitening/compression
    * pipeline materializes. Scan-side native projection, no shuffle. */
  def embeddingPca(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    graft.operators.Pca.project(vectors, pcaModelFor(spark, sfDir))
      .select(col("vec_id"), posexplode(col("proj")))
      .select(col("vec_id"), col("pos").cast("long").as("comp"),
        col("col").as("val"))
  }

  /** Recall@10 of brute search in the PCA-[[PcaK]] space against the
    * full-dimension ground truth — the trained counterpart of
    * ann_dim_curve's d=8 prefix-truncation row: both spend an 8-double
    * budget per vector; PCA keeps the variance-optimal subspace,
    * truncation an arbitrary one. Same |queries|·k join shape as
    * [[annRecall]]. */
  def annPcaRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val pv = graft.operators.Pca.project(vectors, pcaModelFor(spark, sfDir))
      .select(col("vec_id"), col("proj").as("embedding"))
    val pq = pv.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val approx = SimilaritySearch.bruteForceTopKHeap(pv, pq, k = 10)
      .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1L))
    annBrute(spark, sfDir).select(col("query_id"), col("vec_id"))
      .join(approx, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        round(col("hits").cast("double") / 10.0, 4).as("recall"))
  }

  /** MMR-diversified retrieval: the brute top-10 shortlist re-ranked
    * by Maximal Marginal Relevance ([[SimilaritySearch.mmrRerank]]) —
    * the RAG final stage that trades pure relevance for coverage. */
  def annMmr(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.mmrRerank(annBrute(spark, sfDir),
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))

  /** The production-path MMR twin: the nprobe-bounded IVF shortlist
    * re-ranked by the same greedy MMR — the seam a serving stack uses
    * (ANN candidates in, diversified context out). Identical fusion
    * machinery; only the shortlist source differs. */
  def annMmrIvf(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.mmrRerank(annIvf(spark, sfDir),
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))

  /** Prototypicality pruning over the embeddings table — keep the
    * hardest half of every IVF cell (see
    * [[SimilaritySearch.prototypePrune]]); same trained quantizer as
    * ann_ivf / semantic_neardup. */
  def prunePrototypes(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    SimilaritySearch.prototypePrune(vectors, ivfCentroids(vectors, sfDir))
  }

  /** Store-backed prototype pruning: scores the PERSISTED inverted
    * file's pre-assigned rows — zero assignment work over the corpus,
    * identical oracle to the recompute form. */
  def prunePrototypesStore(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    SimilaritySearch.prototypePruneFromIndexed(
      ivfStoreFor(spark, sfDir, vectors, centroids).table(spark), centroids)
  }

  /** Recall@k of the IVF-PQ ADC ranking against exact ground truth —
    * the quantization-loss gauge (how much the 8×16 code compression
    * costs in retrieval quality, the number faiss users tune m/ksub
    * by). Same |queries|·k join shape as [[annRecall]]. */
  def annRecallPq(spark: SparkSession, sfDir: String): DataFrame = {
    val brute = annBrute(spark, sfDir).select(col("query_id"), col("vec_id"))
    val pq = annIvfPq(spark, sfDir)
      .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1L))
    brute.join(pq, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        round(col("hits").cast("double") / 10.0, 4).as("recall"))
  }

  /** Inverted-file balance monitor (faiss's imbalance_factor story):
    * per-cell population from the PERSISTED inverted file — the
    * operational signal that the quantizer needs retraining (a hot
    * cell degrades every probe that lands in it; the probe cost model
    * assumes ~|corpus|·nprobe/nlist candidates). Bare bucketed scan +
    * partial-agg count; at serving scale this reads the store's cell
    * column only. */
  def ivfCellStats(spark: SparkSession, sfDir: String): DataFrame = {
    val vectors = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val centroids = ivfCentroids(vectors, sfDir)
    ivfStoreFor(spark, sfDir, vectors, centroids).table(spark)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  def embeddingNearDupLsh(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.lshNearDupPairs(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      threshold = 0.4)

  /** Batch split for the incremental embedding near-dup probe — shared
    * with the generated oracle, which filters the full self-dedup pair
    * set to pairs touching the batch (the same equivalence every other
    * incremental probe gate relies on: bucketing is per-vector). */
  val EmbIncrementalBatchMod = 5

  def embeddingNearDupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    SimilaritySearch.incrementalLshNearDupPairs(
      vecs.filter(col("vec_id") % EmbIncrementalBatchMod === 0),
      vecs.filter(col("vec_id") % EmbIncrementalBatchMod =!= 0),
      threshold = 0.4)
  }

  private val embStores = new java.util.concurrent.ConcurrentHashMap[
    String, graft.operators.EmbStore]()

  /** Store-backed incremental embedding near-dup: the seen corpus's
    * PERSISTED bucket rows and pre-normed vectors
    * ([[graft.operators.EmbStore]]) are probed instead of re-hashing /
    * re-norming the seen side — the 100 TB form of
    * embedding_neardup_incremental, under the IDENTICAL oracle.
    * (EmbStoreSpec pins the zero-seen-side-recompute plan.) */
  def embeddingNearDupIncrementalStore(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val batch = vecs.filter(col("vec_id") % EmbIncrementalBatchMod === 0)
    val seen = vecs.filter(col("vec_id") % EmbIncrementalBatchMod =!= 0)
    val store = embStores.computeIfAbsent(sfDir, dir => {
      val s = new graft.operators.EmbStore(
        s"graft_emb_store_${graft.QueryPack.storeSuffix(dir)}")
      s.ingest(seen)
      s
    })
    store.probe(batch, threshold = 0.4)
  }

  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame =
    SimilaritySearch.cosineNearDupPairs(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      threshold = 0.4)

  /** Semantic decontamination split: vec_id % 20 == 7 plays the
    * held-out benchmark embeddings (mirroring TextOps.ContamBenchMod/
    * Rem for the n-gram gate), the rest the training corpus; cosine >=
    * 0.4 is the leak verdict. 6 of 475 corpus vectors are contaminated
    * at the sf0.01 gate — both verdict branches live. Constants shared
    * with the generated oracle. */
  val SemContamMod = 20
  val SemContamRem = 7
  val SemContamThreshold = 0.4

  private def semContamSides(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    (vecs.filter(col("vec_id") % SemContamMod =!= SemContamRem),
      vecs.filter(col("vec_id") % SemContamMod === SemContamRem))
  }

  def decontaminateSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val (corpus, eval) = semContamSides(spark, sfDir)
    SimilaritySearch.semanticContamination(corpus, eval, SemContamThreshold)
  }

  private val semContamStores = new java.util.concurrent.ConcurrentHashMap[
    String, graft.operators.EmbStore]()

  /** Store-backed semantic decontamination: the benchmark's PERSISTED
    * pre-normed vectors ([[graft.operators.EmbStore]] vector table)
    * broadcast into the probe instead of re-casting/re-norming the
    * eval set per run — the ingest-loop form of
    * [[decontaminateSemantic]], under the IDENTICAL oracle (the store
    * only moves WHERE the eval vectors come from). */
  def decontaminateSemanticStore(spark: SparkSession,
      sfDir: String): DataFrame = {
    val (corpus, eval) = semContamSides(spark, sfDir)
    val store = semContamStores.computeIfAbsent(sfDir, dir => {
      val s = new graft.operators.EmbStore(
        s"graft_semcontam_store_${graft.QueryPack.storeSuffix(dir)}")
      s.ingest(eval)
      s
    })
    SimilaritySearch.semanticContaminationFrom(
      SimilaritySearch.normalizedVectors(corpus),
      store.vectorRows(spark).select("vec_id", "emb", "nrm"),
      SemContamThreshold)
  }

  /** Matryoshka truncation budgets for [[annDimCurve]] — prefix
    * lengths of the 64-dim embeddings; shared with the generated
    * oracle. */
  val AnnCurveDims = Seq(8, 16, 32, 64)

  /** Dim-truncation recall curve (the Matryoshka ablation): recall@10
    * of brute-force search over the first d dims against full-dim
    * ground truth, one row per d — the table that prices a 2×/4×/8×
    * memory-and-IO cut in retrieval quality (truncated prefixes are
    * how MRL embeddings are actually served at scale).
    *
    * Scale shape: each truncation is the SAME broadcast-queries
    * scoring pass as ann_brute over a d/64-sized projection (in
    * production the candidate stage is the ANN index per dim); the
    * recall join is |queries|·k·|dims| rows. */
  def annDimCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val queries = queriesDf(spark, sfDir)
    val gt = SimilaritySearch.bruteForceTopK(vecs, queries, k = 10)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    val perDim = AnnCurveDims.map { d =>
      val tv = vecs.select(col("vec_id"),
        slice(col("embedding"), 1, d).as("embedding"))
      val tq = queries.select(col("query_id"),
        slice(col("q_emb"), 1, d).as("q_emb"))
      SimilaritySearch.bruteForceTopK(tv, tq, k = 10)
        .select(col("query_id"), col("vec_id"), lit(d.toLong).as("dim"))
    }.reduce(_ unionByName _)
    perDim.join(gt, Seq("query_id", "vec_id"), "left")
      .groupBy(col("dim"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        countDistinct(col("query_id")).as("n_queries"))
      .select(col("dim"), col("hits"), col("n_queries"),
        round(col("hits").cast("double") /
          (col("n_queries") * lit(10L)).cast("double"), 4).as("recall"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute" -> (annBrute _),
    "ann_brute_int8" -> (annBruteInt8 _),
    "ann_lsh" -> (annLsh _),
    "ann_topk_agg" -> (annTopkAgg _),
    "ann_ivf" -> (annIvf _),
    "ann_ivf_store" -> (annIvfStore _),
    "ann_ivfpq" -> (annIvfPq _),
    "ann_ivfpq_store" -> (annIvfPqStore _),
    "ann_ivfpq_refine" -> (annIvfPqRefine _),
    "ivf_cell_stats" -> (ivfCellStats _),
    "ann_recall" -> (annRecall _),
    "ann_rank_metrics" -> (annRankMetrics _),
    "ann_mmr" -> (annMmr _),
    "embedding_pca" -> (embeddingPca _),
    "ann_pca_recall" -> (annPcaRecall _),
    "ann_mmr_ivf" -> (annMmrIvf _),
    "ann_hard_negatives" -> (annHardNegatives _),
    "ann_recall_pq" -> (annRecallPq _),
    "prune_prototypes" -> (prunePrototypes _),
    "prune_prototypes_store" -> (prunePrototypesStore _),
    "ann_hamming" -> (annHamming _),
    "ann_ivfpq_res" -> (annIvfPqRes _),
    "embedding_neardup" -> (embeddingNearDup _),
    "embedding_neardup_lsh" -> (embeddingNearDupLsh _),
    "embedding_neardup_incremental" -> (embeddingNearDupIncremental _),
    "embedding_neardup_incremental_store" -> (embeddingNearDupIncrementalStore _),
    "semantic_neardup" -> (semanticNearDup _),
    "semantic_dedup_keep" -> (semanticDedupKeep _),
    "semantic_dedup_keep_far" -> (semanticDedupKeepFar _),
    "semantic_neardup_incremental_store" -> (semanticNearDupIncrementalStore _),
    "decontaminate_semantic" -> (decontaminateSemantic _),
    "decontaminate_semantic_store" -> (decontaminateSemanticStore _),
    "ann_dim_curve" -> (annDimCurve _)
  )

  private val normCte =
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |         sqrt(list_sum(list_transform(generate_series(1, 64),
      |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |)""".stripMargin

  private def annBruteOracle: String = normCte +
    """, q AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
      |  FROM v WHERE vec_id % 100 = 0
      |), scored AS (
      |  SELECT q.query_id, v.vec_id,
      |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
      |           ELSE list_sum(list_transform(generate_series(1, 64),
      |                  i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
      |                / (q.q_nrm * v.nrm) END, 4) AS sim
      |  FROM q, v WHERE v.vec_id <> q.query_id
      |)
      |SELECT query_id, vec_id, sim, rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, vec_id ASC) AS rk
      |  FROM scored
      |) WHERE rk <= 10""".stripMargin

  /** DuckDB twin of [[graft.operators.SimilaritySearch.mmrRerank]] over
    * the brute shortlist: the SAME greedy rounds unrolled as CTEs —
    * per round, the not-yet-selected shortlist scored by λ·sim −
    * (1−λ)·max pair-sim to the selection, argmax by (round-4 score
    * DESC, vec_id ASC), the identical total order as the Spark side's
    * max(struct). λ and 1−λ cross as exact-double literals
    * ([[sqlDouble]] — 1−λ is embedded as the exact double Spark
    * computes, not the decimal 0.3). */
  private def mmrOracle: String = mmrOracleOver(annBruteOracle)

  /** The MMR rounds over an arbitrary shortlist oracle — shared by the
    * brute-shortlist gate, the IVF-shortlist production twin, AND the
    * hybrid-RRF serving composition (TextOps), so the greedy machinery
    * cannot fork between them. `vectorsSql` supplies the candidate
    * vectors as a parenthesized subquery yielding
    * (vec_id, embedding DOUBLE[], nrm) — default: the embeddings
    * table; the hybrid form passes its HashEmbed derivation.
    * `outIdCol` renames the selected id in the final projection (the
    * hybrid surface speaks doc_id). */
  private[packs] def mmrOracleOver(shortlistSql: String,
      vectorsSql: String = null, dim: Int = 64,
      outIdCol: String = "vec_id"): String = {
    import graft.operators.SimilaritySearch.{MmrLambda, MmrSelectK}
    val lam = sqlDouble(MmrLambda)
    val om = sqlDouble(1.0 - MmrLambda)
    val nsub = Option(vectorsSql).getOrElse(
      s"""(SELECT vec_id, embedding,
        |      sqrt(list_sum(list_transform(generate_series(1, $dim),
        |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |    FROM embeddings)""".stripMargin)
    val rounds = (2 to MmrSelectK).map { r =>
      val prev = r - 1
      s"""sel$r AS (
         |  SELECT query_id, vec_id, score, CAST($r AS BIGINT) AS rk FROM (
         |    SELECT query_id, vec_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, vec_id ASC) AS rn
         |    FROM (
         |      SELECT s.query_id, s.vec_id,
         |        round($lam * s.sim - $om * max(p.psim), 4) AS score
         |      FROM shortlist s
         |      JOIN mpair p ON p.query_id = s.query_id AND p.vec_a = s.vec_id
         |      JOIN seln$prev sl ON sl.query_id = p.query_id AND sl.vec_id = p.vec_b
         |      WHERE NOT EXISTS (SELECT 1 FROM seln$prev e
         |                        WHERE e.query_id = s.query_id AND e.vec_id = s.vec_id)
         |      GROUP BY s.query_id, s.vec_id, s.sim))
         |  WHERE rn = 1),
         |seln$r AS (SELECT * FROM seln$prev UNION ALL SELECT * FROM sel$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH shortlist AS (
       |$shortlistSql
       |), mpair AS (
       |  SELECT s1.query_id, s1.vec_id AS vec_a, s2.vec_id AS vec_b,
       |    round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
       |      ELSE list_sum(list_transform(generate_series(1, $dim),
       |             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       |           / (a.nrm * b.nrm) END, 4) AS psim
       |  FROM shortlist s1
       |  JOIN shortlist s2 ON s1.query_id = s2.query_id AND s1.vec_id <> s2.vec_id
       |  JOIN $nsub a ON a.vec_id = s1.vec_id
       |  JOIN $nsub b ON b.vec_id = s2.vec_id
       |),
       |sel1 AS (
       |  SELECT query_id, vec_id, score, CAST(1 AS BIGINT) AS rk FROM (
       |    SELECT query_id, vec_id, round($lam * sim, 4) AS score,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY round($lam * sim, 4) DESC, vec_id ASC) AS rn
       |    FROM shortlist)
       |  WHERE rn = 1),
       |seln1 AS (SELECT * FROM sel1),
       |$rounds
       |SELECT query_id, rk, vec_id AS $outIdCol, score FROM seln$MmrSelectK""".stripMargin
  }

  /** A Scala double as a DuckDB literal that parses DIRECTLY as DOUBLE.
    * Plain decimal literals type as DECIMAL(p,s) and the DECIMAL→DOUBLE
    * conversion can land 1 ulp off (measured ~1/4000 on random doubles;
    * `::DOUBLE[]` casts of DECIMAL lists are no better — ~10% off by an
    * ulp). A literal WITH an exponent types as DOUBLE at parse time and
    * round-trips Scala's shortest-representation toString bit-exactly
    * (0/8000 deviations measured), so append `e0` when toString emitted
    * no exponent. */
  private[packs] def sqlDouble(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** The plane matrix as a DuckDB VALUES CTE: one row per (table,
    * plane) with the 2^p bit weight and the plane as a list literal.
    * Elements are exponent-form literals (see sqlDouble), so DuckDB
    * materializes the bit-identical DOUBLE[] the engine's codegen uses
    * and the sign buckets match exactly. */
  private[packs] def planesCte(planes: Array[Array[Array[Double]]]): String = {
    val rows = for {
      t <- planes.indices
      p <- planes(t).indices
    } yield s"($t, ${1L << p}, [${planes(t)(p).map(sqlDouble).mkString(", ")}])"
    s"planes(tbl, pw, w) AS (VALUES\n  ${rows.mkString(",\n  ")})"
  }

  /** Bucket id per (vector, table): bit p set iff v·plane_p > 0 —
    * identical to HyperplaneBuckets.compute (same left-to-right dot,
    * same strict > 0). */
  private[packs] val vbuckCte =
    """vbuck AS (
      |  SELECT vec_id, tbl,
      |         CAST(sum(CASE WHEN list_sum(list_transform(generate_series(1, 64),
      |           i -> CAST(embedding[i] AS DOUBLE) * w[i])) > 0
      |           THEN pw ELSE 0 END) AS BIGINT) AS bucket
      |  FROM v, planes GROUP BY vec_id, tbl
      |)""".stripMargin

  private def annLshOracle: String = {
    val planes = SimilaritySearch.hyperplanes(nTables = 4, nPlanes = 8,
      dim = 64, seed = 42L)
    normCte + ",\n" + planesCte(planes) + ",\n" + vbuckCte + ",\n" +
      """q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
        |  FROM v WHERE vec_id % 100 = 0
        |), qbuck AS (
        |  SELECT vec_id AS query_id, tbl, bucket FROM vbuck WHERE vec_id % 100 = 0
        |), cand AS (
        |  SELECT DISTINCT qb.query_id, vb.vec_id
        |  FROM qbuck qb JOIN vbuck vb USING (tbl, bucket)
        |  WHERE vb.vec_id <> qb.query_id
        |), scored AS (
        |  SELECT c.query_id, c.vec_id,
        |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
        |           ELSE list_sum(list_transform(generate_series(1, 64),
        |                  i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
        |                / (q.q_nrm * v.nrm) END, 4) AS sim
        |  FROM cand c
        |  JOIN q ON q.query_id = c.query_id
        |  JOIN v ON v.vec_id = c.vec_id
        |)
        |SELECT query_id, vec_id, sim, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id ASC) AS rk
        |  FROM scored
        |) WHERE rk <= 10""".stripMargin
  }

  /** The trained centroid matrix as a DuckDB VALUES CTE (cell, weights,
    * precomputed ||c||² — same sequential sum as CentroidSet.fromRows). */
  private def centCte(centroids: Seq[Seq[Double]]): String = {
    val rows = centroids.zipWithIndex.map { case (c, i) =>
      val nsq = c.foldLeft(0.0)((s, x) => s + x * x)
      s"($i, [${c.map(sqlDouble).mkString(", ")}], ${sqlDouble(nsq)})"
    }
    s"cent(cell, w, nsq) AS (VALUES\n  ${rows.mkString(",\n  ")})"
  }

  /** Cell assignment CTE: argmin of ||c||² − 2·v·c with ties to the
    * lowest cell — CentroidSet.assign's exact arithmetic (`list_reduce`
    * = sequential left fold, bit-identical to the engine's loop). */
  private val vcellCte =
    """vcell AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT v.vec_id, c.cell,
      |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |             c.nsq - 2 * list_reduce(list_transform(generate_series(1, 64),
      |               i -> CAST(v.embedding[i] AS DOUBLE) * c.w[i]),
      |               (acc, x) -> acc + x) ASC,
      |             c.cell ASC) AS rn
      |    FROM v, cent c
      |  ) WHERE rn = 1
      |)""".stripMargin

  /** DuckDB oracle for ann_ivf, generated from the exact centroid matrix
    * the engine trained (IvfIndex training is deterministic: seedless
    * stride sample, fixed iterations, strict-< argmin — so the matrix is
    * a pure function of the dataset, and Verify's query pass has already
    * cached it when oracleSql is dumped). Mirrors the engine stage for
    * stage: cell assignment is the argmin of the centroid-relative
    * distance ||c||² − 2·v·c with ties to the lowest cell index
    * (CentroidSet.assign), the probe list is the nprobe nearest cells by
    * the same ordering (CentroidSet.nearest), candidates come only from
    * probed cells, and the scored/ranked tail is annBruteOracle's.
    * ||c||² is embedded as a precomputed literal (same sequential sum as
    * CentroidSet.fromRows). Crucially, the argmin dots use `list_reduce`
    * — DuckDB's sequential left fold, bit-identical to the engine's
    * accumulation loop — NOT `list_sum`, whose free summation order
    * could flip an argmin between near-equidistant cells and change
    * whole result rows (a ~1e-15 delta is harmless inside round(.,4)
    * score columns, but an ORDERING decided by it must be exact). */
  private def annIvfOracle(centroids: Seq[Seq[Double]], k: Int,
      nprobe: Int): String = {
    normCte + ",\n" + centCte(centroids) + ",\n" + vcellCte + ",\n" +
      s"""q AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
         |  FROM v WHERE vec_id % 100 = 0
         |), qprobe AS (
         |  SELECT query_id, cell FROM (
         |    SELECT q.query_id, c.cell,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             c.nsq - 2 * list_reduce(list_transform(generate_series(1, 64),
         |               i -> CAST(q.q_emb[i] AS DOUBLE) * c.w[i]),
         |               (acc, x) -> acc + x) ASC,
         |             c.cell ASC) AS rn
         |    FROM q, cent c
         |  ) WHERE rn <= $nprobe
         |), cand AS (
         |  SELECT qp.query_id, vc.vec_id
         |  FROM qprobe qp JOIN vcell vc USING (cell)
         |  WHERE vc.vec_id <> qp.query_id
         |), scored AS (
         |  SELECT c.query_id, c.vec_id,
         |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
         |           ELSE list_sum(list_transform(generate_series(1, 64),
         |                  i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
         |                / (q.q_nrm * v.nrm) END, 4) AS sim
         |  FROM cand c
         |  JOIN q ON q.query_id = c.query_id
         |  JOIN v ON v.vec_id = c.vec_id
         |)
         |SELECT query_id, vec_id, sim, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM scored
         |) WHERE rk <= $k""".stripMargin
  }

  /** The PQ codebooks as a DuckDB VALUES CTE: one row per (subspace,
    * code) with the dsub-element weight list and precomputed ||c||²
    * (same sequential sum as PqSet/CentroidSet). */
  private def cbCte(codebooks: Seq[Seq[Seq[Double]]]): String = {
    val rows = for {
      s <- codebooks.indices
      k <- codebooks(s).indices
    } yield {
      val c = codebooks(s)(k)
      val nsq = c.foldLeft(0.0)((acc, x) => acc + x * x)
      s"($s, $k, [${c.map(sqlDouble).mkString(", ")}], ${sqlDouble(nsq)})"
    }
    s"cb(sub, code, w, nsq) AS (VALUES\n  ${rows.mkString(",\n  ")})"
  }

  /** DuckDB oracle for ann_ivfpq, generated from the trained centroid
    * matrix AND codebooks (both deterministic functions of the
    * dataset). Stage-for-stage mirror: coarse cells via [[vcellCte]],
    * per-subspace code argmin with `list_reduce` sequential dots over
    * the embedding SLICE (CentroidAssign over slice() in the engine —
    * discrete decisions need exact arithmetic), probe list as in
    * ann_ivf, and the ADC score = Σ_sub q_sub·codebook[sub][code]
    * divided by the true norms, rounded before ranking (summation
    * order slop lives inside round(.,4), the established score
    * discipline). */
  private def annIvfPqOracle(centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], k: Int, nprobe: Int): String =
    ivfPqAdcCtes(centroids, codebooks, nprobe) +
      s"""
         |SELECT query_id, vec_id, sim, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM scored
         |) WHERE rk <= $k""".stripMargin

  /** PQ shortlist + exact re-rank: the ADC `scored` CTE narrows to the
    * shortlist (same rounded-sim/vec_id rank the engine's heap
    * produces), then exact cosine over raw vectors ranks the final k. */
  private def annIvfPqRefineOracle(centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], k: Int, shortlist: Int,
      nprobe: Int): String =
    ivfPqAdcCtes(centroids, codebooks, nprobe) +
      s""", sl AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id ASC) AS rk
         |    FROM scored
         |  ) WHERE rk <= $shortlist
         |), refined AS (
         |  SELECT s.query_id, s.vec_id,
         |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
         |           ELSE list_sum(list_transform(generate_series(1, 64),
         |                  i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
         |                / (q.q_nrm * v.nrm) END, 4) AS sim
         |  FROM sl s
         |  JOIN q ON q.query_id = s.query_id
         |  JOIN v ON v.vec_id = s.vec_id
         |)
         |SELECT query_id, vec_id, sim, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM refined
         |) WHERE rk <= $k""".stripMargin

  /** Shared CTE prefix of the IVF-PQ oracles, ending at the ADC
    * `scored` CTE (rounded quantized sim per candidate). */
  private def ivfPqAdcCtes(centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], nprobe: Int): String = {
    val dsub = codebooks.head.head.length
    normCte + ",\n" + centCte(centroids) + ",\n" + vcellCte + ",\n" +
      cbCte(codebooks) + ",\n" +
      s"""vcode AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT v.vec_id, c.sub, c.code,
         |           row_number() OVER (PARTITION BY v.vec_id, c.sub ORDER BY
         |             c.nsq - 2 * list_reduce(list_transform(generate_series(1, $dsub),
         |               i -> CAST(v.embedding[c.sub * $dsub + i] AS DOUBLE) * c.w[i]),
         |               (acc, x) -> acc + x) ASC,
         |             c.code ASC) AS rn
         |    FROM v, cb c
         |  ) WHERE rn = 1
         |), q AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
         |  FROM v WHERE vec_id % 100 = 0
         |), qprobe AS (
         |  SELECT query_id, cell FROM (
         |    SELECT q.query_id, c.cell,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             c.nsq - 2 * list_reduce(list_transform(generate_series(1, 64),
         |               i -> CAST(q.q_emb[i] AS DOUBLE) * c.w[i]),
         |               (acc, x) -> acc + x) ASC,
         |             c.cell ASC) AS rn
         |    FROM q, cent c
         |  ) WHERE rn <= $nprobe
         |), cand AS (
         |  SELECT qp.query_id, vc.vec_id
         |  FROM qprobe qp JOIN vcell vc USING (cell)
         |  WHERE vc.vec_id <> qp.query_id
         |), adc AS (
         |  SELECT c.query_id, c.vec_id,
         |         sum(list_reduce(list_transform(generate_series(1, $dsub),
         |           i -> CAST(q.q_emb[vc.sub * $dsub + i] AS DOUBLE) * b.w[i]),
         |           (acc, x) -> acc + x)) AS adot
         |  FROM cand c
         |  JOIN q ON q.query_id = c.query_id
         |  JOIN vcode vc ON vc.vec_id = c.vec_id
         |  JOIN cb b ON b.sub = vc.sub AND b.code = vc.code
         |  GROUP BY c.query_id, c.vec_id
         |), scored AS (
         |  SELECT a.query_id, a.vec_id,
         |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
         |           ELSE a.adot / (q.q_nrm * v.nrm) END, 4) AS sim
         |  FROM adc a
         |  JOIN q ON q.query_id = a.query_id
         |  JOIN v ON v.vec_id = a.vec_id
         |)""".stripMargin
  }

  /** Hamming oracle: the same vbuck sign-bucket CTE the LSH oracles
    * prove, pivoted to two 32-bit words; scoring is integer
    * XOR+popcount — bit-exact cross-engine with no rounding needed. */
  private def annHammingOracle: String = {
    val planes = SimilaritySearch.hyperplanes(nTables = 2, nPlanes = 32,
      dim = 64, seed = 42L)
    normCte + ",\n" + planesCte(planes) + ",\n" + vbuckCte + ",\n" +
      """codes AS (
        |  SELECT vec_id,
        |         CAST(max(CASE WHEN tbl = 0 THEN bucket END) AS BIGINT) AS c0,
        |         CAST(max(CASE WHEN tbl = 1 THEN bucket END) AS BIGINT) AS c1
        |  FROM vbuck GROUP BY vec_id
        |), q AS (
        |  SELECT vec_id AS query_id, c0 AS q0, c1 AS q1
        |  FROM codes WHERE vec_id % 100 = 0
        |), scored AS (
        |  SELECT q.query_id, c.vec_id,
        |         CAST(64 - bit_count(xor(c.c0, q.q0))
        |              - bit_count(xor(c.c1, q.q1)) AS DOUBLE) AS sim
        |  FROM q, codes c WHERE c.vec_id <> q.query_id
        |)
        |SELECT query_id, vec_id, sim, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id ASC) AS rk
        |  FROM scored
        |) WHERE rk <= 10""".stripMargin
  }

  /** Residual IVF-PQ oracle: the residual is an exact elementwise
    * subtraction (no accumulation — cross-engine safe by
    * construction); the code argmin folds sequentially over residual
    * slices (the engine's CentroidAssign loop over zip_with output);
    * the score adds the sequential centroid dot to the ADC sum before
    * the one division and rounding. */
  private def annIvfPqResOracle(centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], k: Int, nprobe: Int): String = {
    val dsub = codebooks.head.head.length
    normCte + ",\n" + centCte(centroids) + ",\n" + vcellCte + ",\n" +
      cbCte(codebooks) + ",\n" +
      s"""vres AS (
         |  SELECT v.vec_id, vc.cell,
         |         list_transform(generate_series(1, 64),
         |           i -> CAST(v.embedding[i] AS DOUBLE) - ct.w[i]) AS res
         |  FROM v
         |  JOIN vcell vc ON vc.vec_id = v.vec_id
         |  JOIN cent ct ON ct.cell = vc.cell
         |), vcode AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT r.vec_id, c.sub, c.code,
         |           row_number() OVER (PARTITION BY r.vec_id, c.sub ORDER BY
         |             c.nsq - 2 * list_reduce(list_transform(generate_series(1, $dsub),
         |               i -> r.res[c.sub * $dsub + i] * c.w[i]),
         |               (acc, x) -> acc + x) ASC,
         |             c.code ASC) AS rn
         |    FROM vres r, cb c
         |  ) WHERE rn = 1
         |), q AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
         |  FROM v WHERE vec_id % 100 = 0
         |), qprobe AS (
         |  SELECT query_id, cell FROM (
         |    SELECT q.query_id, c.cell,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             c.nsq - 2 * list_reduce(list_transform(generate_series(1, 64),
         |               i -> CAST(q.q_emb[i] AS DOUBLE) * c.w[i]),
         |               (acc, x) -> acc + x) ASC,
         |             c.cell ASC) AS rn
         |    FROM q, cent c
         |  ) WHERE rn <= $nprobe
         |), cand AS (
         |  SELECT qp.query_id, vc.vec_id, vc.cell
         |  FROM qprobe qp JOIN vcell vc USING (cell)
         |  WHERE vc.vec_id <> qp.query_id
         |), adc AS (
         |  SELECT c.query_id, c.vec_id,
         |         sum(list_reduce(list_transform(generate_series(1, $dsub),
         |           i -> CAST(q.q_emb[vc.sub * $dsub + i] AS DOUBLE) * b.w[i]),
         |           (acc, x) -> acc + x)) AS rdot
         |  FROM cand c
         |  JOIN q ON q.query_id = c.query_id
         |  JOIN vcode vc ON vc.vec_id = c.vec_id
         |  JOIN cb b ON b.sub = vc.sub AND b.code = vc.code
         |  GROUP BY c.query_id, c.vec_id
         |), cdot AS (
         |  SELECT c.query_id, c.vec_id,
         |         list_reduce(list_transform(generate_series(1, 64),
         |           i -> CAST(q.q_emb[i] AS DOUBLE) * ct.w[i]),
         |           (acc, x) -> acc + x) AS cd
         |  FROM cand c
         |  JOIN q ON q.query_id = c.query_id
         |  JOIN cent ct ON ct.cell = c.cell
         |), scored AS (
         |  SELECT a.query_id, a.vec_id,
         |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
         |           ELSE (cd.cd + a.rdot) / (q.q_nrm * v.nrm) END, 4) AS sim
         |  FROM adc a
         |  JOIN cdot cd ON cd.query_id = a.query_id AND cd.vec_id = a.vec_id
         |  JOIN q ON q.query_id = a.query_id
         |  JOIN v ON v.vec_id = a.vec_id
         |)
         |SELECT query_id, vec_id, sim, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM scored
         |) WHERE rk <= $k""".stripMargin
  }

  /** SemDeDup pair CTEs, generated from the SAME trained matrix as the
    * ann_ivf oracle (the engine reuses one quantizer for both): cell
    * assignment via [[vcellCte]]'s exact argmin, degenerate cells
    * capped with the engine's HAVING mirror, candidates = within-cell
    * id-ordered pairs, exact-cosine verification tail. */
  private def semanticPairsWith(centroids: Seq[Seq[Double]]): String =
    normCte + ",\n" + centCte(centroids) + ",\n" + vcellCte + ",\n" +
      s"""ckeep AS (
         |  SELECT vc.vec_id, vc.cell FROM vcell vc
         |  JOIN (SELECT cell FROM vcell GROUP BY cell
         |        HAVING count(*) <= ${SimilaritySearch.SemDedupMaxCellSize}) ok
         |    USING (cell)
         |), cand AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM ckeep a JOIN ckeep b USING (cell)
         |  WHERE a.vec_id < b.vec_id
         |), pairs AS (
         |  SELECT vec_a, vec_b, sim FROM (
         |    SELECT c.vec_a, c.vec_b,
         |           round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
         |             ELSE list_sum(list_transform(generate_series(1, 64),
         |                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         |                  / (a.nrm * b.nrm) END, 4) AS sim
         |    FROM cand c
         |    JOIN v a ON a.vec_id = c.vec_a
         |    JOIN v b ON b.vec_id = c.vec_b
         |  ) s WHERE sim >= 0.4
         |)""".stripMargin

  /** Prototype-pruning oracle: same cell assignment + cosine as the
    * engine (sequential dots, sqlDouble literals), ranked per cell on
    * the ROUNDED score with id tie-break; 0.5e0 parses as DOUBLE so
    * the keep-count ceil is the same IEEE arithmetic. */
  private def protoPruneOracle(c: Seq[Seq[Double]]): String =
    normCte + ",\n" + centCte(c) + ",\n" + vcellCte + ",\n" +
      s"""scored AS (
         |  SELECT v.vec_id, vc.cell,
         |         round(CASE WHEN v.nrm * sqrt(c.nsq) = 0 THEN 0.0
         |           ELSE list_sum(list_transform(generate_series(1, 64),
         |                  i -> CAST(v.embedding[i] AS DOUBLE) * c.w[i]))
         |                / (v.nrm * sqrt(c.nsq)) END, 4) AS proto
         |  FROM v JOIN vcell vc USING (vec_id) JOIN cent c ON c.cell = vc.cell
         |), counts AS (
         |  SELECT cell, count(*) AS n_cell FROM scored GROUP BY cell
         |), ranked AS (
         |  SELECT vec_id, cell, proto, row_number() OVER (
         |    PARTITION BY cell ORDER BY proto ASC, vec_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT r.vec_id, r.cell, r.proto, r.rk::BIGINT AS rk
         |FROM ranked r JOIN counts USING (cell)
         |WHERE r.rk <= ceil(${sqlDouble(SimilaritySearch.ProtoKeepFrac)} * n_cell)""".stripMargin

  private def semanticNearDupOracle(c: Seq[Seq[Double]]): String =
    semanticPairsWith(c) + "\nSELECT vec_a, vec_b, sim FROM pairs"

  /** Incremental probe ≡ self pairs touching the batch (cell
    * assignment is per-vector — the standard incremental equivalence). */
  private def semanticIncrementalOracle(c: Seq[Seq[Double]]): String =
    semanticPairsWith(c) +
      s"\nSELECT vec_a, vec_b, sim FROM pairs" +
      s"\nWHERE vec_a % $EmbIncrementalBatchMod = 0" +
      s" OR vec_b % $EmbIncrementalBatchMod = 0"

  /** Survivors: every vec_id without a smaller-id semantic near-dup.
    * (NOT IN is safe: vec_b is never NULL by construction.) */
  private def semanticKeepOracle(c: Seq[Seq[Double]]): String =
    semanticPairsWith(c) +
      "\nSELECT vec_id FROM v WHERE vec_id NOT IN (SELECT vec_b FROM pairs)"

  /** The paper policy: recursive components over the pair graph, keep
    * the member with MAX relative distance ||c||² − 2·v·c to its cell
    * centroid (exact argmin arithmetic — nsq literal + sequential
    * fold), ties → min id. */
  private def semanticKeepFarOracle(c: Seq[Seq[Double]]): String =
    "WITH RECURSIVE " + semanticPairsWith(c).stripPrefix("WITH ") + ",\n" +
      """edges AS (
        |  SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION
        |  SELECT vec_b AS src, vec_a AS dst FROM pairs
        |), reach(vv, lbl) AS (
        |  SELECT vec_id, vec_id FROM v
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.vv = e.src
        |), cc AS (
        |  SELECT vv, min(lbl) AS cluster_id FROM reach GROUP BY vv
        |), vdist AS (
        |  SELECT vc.vec_id,
        |         ct.nsq - 2 * list_reduce(list_transform(generate_series(1, 64),
        |           i -> CAST(v.embedding[i] AS DOUBLE) * ct.w[i]),
        |           (acc, x) -> acc + x) AS rd
        |  FROM vcell vc
        |  JOIN cent ct ON ct.cell = vc.cell
        |  JOIN v ON v.vec_id = vc.vec_id
        |), jj AS (
        |  SELECT cc.vv AS vec_id, cc.cluster_id, d.rd
        |  FROM cc JOIN vdist d ON d.vec_id = cc.vv
        |), bb AS (
        |  SELECT cluster_id, max(rd) AS best_rd FROM jj GROUP BY cluster_id
        |), kk AS (
        |  SELECT jj.cluster_id, min(jj.vec_id) AS best_id
        |  FROM jj JOIN bb ON jj.cluster_id = bb.cluster_id AND jj.rd = bb.best_rd
        |  GROUP BY jj.cluster_id
        |)
        |SELECT jj.vec_id FROM jj JOIN kk ON jj.cluster_id = kk.cluster_id
        |WHERE jj.vec_id = kk.best_id""".stripMargin

  /** Bucket-capped candidate pairs + verified-sim tail, shared by the
    * self-dedup and incremental embedding-near-dup oracles. The cap
    * mirror (HAVING count(*) <= max, identical to the engine's
    * partial-agg + anti-join) keeps the two sides equivalent even on a
    * degenerate corpus. `extraPred` restricts the final pair set (the
    * incremental "touching the batch" filter). */
  /** The same chain as a composable CTE ending in
    * `vpairs(vec_a, vec_b, sim)` — parameterized on the threshold so
    * the text-chunk near-dup oracle (TextOps) composes the IDENTICAL
    * bucketing/cap/verify fragment over its own `v`/`vbuck`. */
  private[packs] def embNearDupPairsCtes(threshold: Double = 0.4,
      maxBucketSize: Int = SimilaritySearch.EmbLshMaxBucketSize): String =
    s"""vkeep AS (
       |  SELECT vb.vec_id, vb.tbl, vb.bucket FROM vbuck vb
       |  JOIN (SELECT tbl, bucket FROM vbuck GROUP BY tbl, bucket
       |        HAVING count(*) <= $maxBucketSize) ok
       |    USING (tbl, bucket)
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM vkeep a JOIN vkeep b USING (tbl, bucket)
       |  WHERE a.vec_id < b.vec_id
       |), vpairs AS (
       |  SELECT vec_a, vec_b, sim FROM (
       |    SELECT c.vec_a, c.vec_b,
       |           round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
       |             ELSE list_sum(list_transform(generate_series(1, 64),
       |                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       |                  / (a.nrm * b.nrm) END, 4) AS sim
       |    FROM cand c
       |    JOIN v a ON a.vec_id = c.vec_a
       |    JOIN v b ON b.vec_id = c.vec_b
       |  ) s WHERE sim >= $threshold
       |)""".stripMargin

  private def embNearDupPairsSql(extraPred: String): String =
    embNearDupPairsCtes() +
      s"\nSELECT vec_a, vec_b, sim FROM vpairs WHERE true$extraPred"

  private def embeddingNearDupLshOracle: String = {
    val planes = SimilaritySearch.hyperplanes(nTables = 8, nPlanes = 8,
      dim = 64, seed = 42L)
    normCte + ",\n" + planesCte(planes) + ",\n" + vbuckCte + ",\n" +
      embNearDupPairsSql(extraPred = "")
  }

  /** Incremental probe ≡ full self-dedup restricted to pairs touching
    * the batch — same generated CTEs, one extra predicate (the
    * dedup_incremental_minhash oracle pattern). */
  private def embeddingNearDupIncrementalOracle: String = {
    val planes = SimilaritySearch.hyperplanes(nTables = 8, nPlanes = 8,
      dim = 64, seed = 42L)
    normCte + ",\n" + planesCte(planes) + ",\n" + vbuckCte + ",\n" +
      embNearDupPairsSql(extraPred =
        s"\n  AND (vec_a % $EmbIncrementalBatchMod = 0" +
        s" OR vec_b % $EmbIncrementalBatchMod = 0)")
  }

  /** DuckDB twin of [[decontaminateSemantic]]: the same eval-broadcast
    * cross score (exact index-ordered double math, per-pair round-4)
    * grouped to per-corpus-vector verdicts. Shared verbatim by the
    * store form — the store only moves WHERE the eval vectors come
    * from. */
  private def decontaminateSemanticOracle: String = {
    val thr = sqlDouble(SemContamThreshold)
    normCte +
      s""", dsc_ev AS (
         |  SELECT vec_id, embedding, nrm FROM v
         |  WHERE vec_id % $SemContamMod = $SemContamRem
         |), dsc_co AS (
         |  SELECT vec_id, embedding, nrm FROM v
         |  WHERE vec_id % $SemContamMod <> $SemContamRem
         |), dsc_s AS (
         |  SELECT co.vec_id,
         |         round(CASE WHEN ev.nrm * co.nrm = 0 THEN 0.0
         |           ELSE list_sum(list_transform(generate_series(1, 64),
         |                  i -> CAST(ev.embedding[i] AS DOUBLE) * CAST(co.embedding[i] AS DOUBLE)))
         |                / (ev.nrm * co.nrm) END, 4) AS sim
         |  FROM dsc_ev ev, dsc_co co
         |)
         |SELECT vec_id,
         |  CAST(sum(CASE WHEN sim >= $thr THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
         |  max(sim) AS max_sim,
         |  sum(CASE WHEN sim >= $thr THEN 1 ELSE 0 END) > 0 AS contaminated
         |FROM dsc_s GROUP BY vec_id""".stripMargin
  }

  /** DuckDB twin of [[annDimCurve]]: per truncation budget, the SAME
    * prefix-normed brute ranking as the ann_brute oracle (CTE names
    * prefixed per dim — the bpe_vocab_curve lesson), recall against
    * the d=64 ranking as ground truth. */
  private def annDimCurveOracle: String = {
    val dimCtes = AnnCurveDims.map { d =>
      s"""adc_v$d AS (
         |  SELECT vec_id, embedding,
         |         sqrt(list_sum(list_transform(generate_series(1, $d),
         |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |  FROM embeddings
         |), adc_q$d AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
         |  FROM adc_v$d WHERE vec_id % 100 = 0
         |), adc_s$d AS (
         |  SELECT q.query_id, v.vec_id,
         |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
         |           ELSE list_sum(list_transform(generate_series(1, $d),
         |                  i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
         |                / (q.q_nrm * v.nrm) END, 4) AS sim
         |  FROM adc_q$d q, adc_v$d v WHERE v.vec_id <> q.query_id
         |), adc_t$d AS (
         |  SELECT CAST($d AS BIGINT) AS dim, query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id ASC) AS rk
         |    FROM adc_s$d
         |  ) WHERE rk <= 10
         |)""".stripMargin
    }.mkString(",\n")
    val unionAll =
      AnnCurveDims.map(d => s"SELECT * FROM adc_t$d").mkString(" UNION ALL ")
    s"""WITH $dimCtes,
       |adc_all AS ($unionAll),
       |adc_gt AS (SELECT query_id, vec_id FROM adc_t64)
       |SELECT a.dim,
       |  CAST(sum(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  CAST(count(DISTINCT a.query_id) AS BIGINT) AS n_queries,
       |  round(CAST(sum(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / (count(DISTINCT a.query_id) * 10), 4) AS recall
       |FROM adc_all a LEFT JOIN adc_gt g
       |  ON a.query_id = g.query_id AND a.vec_id = g.vec_id
       |GROUP BY a.dim""".stripMargin
  }

  override def oracleSql: Map[String, String] = Map(
    // same oracle for both — proves the heap aggregate's bit-identity
    "ann_topk_agg" -> annBruteOracle,
    "decontaminate_semantic" -> decontaminateSemanticOracle,
    // the store-backed probe must emit EXACTLY the same verdicts as
    // the recompute form — identical oracle, zero drift allowed
    "decontaminate_semantic_store" -> decontaminateSemanticOracle,
    "ann_dim_curve" -> annDimCurveOracle,

    // label-filtered brute force: same double math, negatives only
    "ann_hard_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding,
        |         sqrt(list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb, nrm AS q_nrm
        |  FROM v WHERE vec_id % 100 = 0
        |), scored AS (
        |  SELECT q.query_id, v.vec_id,
        |         round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
        |           ELSE list_sum(list_transform(generate_series(1, 64),
        |                  i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))
        |                / (q.q_nrm * v.nrm) END, 4) AS sim
        |  FROM q, v
        |  WHERE v.vec_id <> q.query_id AND v.label <> q.q_label
        |)
        |SELECT query_id, vec_id, sim, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id ASC) AS rk
        |  FROM scored
        |) WHERE rk <= 10""".stripMargin,
    "ann_brute" -> annBruteOracle,

    // quantized-cosine: the per-vector scales cancel, so besides the
    // scale division inside round() the whole score is integer-exact
    "ann_brute_int8" ->
      """WITH v0 AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings
        |), c AS (
        |  SELECT vec_id,
        |    CASE WHEN scale = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT))
        |    END AS code
        |  FROM v0
        |), cn AS (
        |  SELECT vec_id, code,
        |    sqrt(CAST(list_sum(list_transform(code, x -> x * x)) AS DOUBLE)) AS n
        |  FROM c
        |), q AS (
        |  SELECT vec_id AS query_id, code AS q_code, n AS q_n
        |  FROM cn WHERE vec_id % 100 = 0
        |), scored AS (
        |  SELECT q.query_id, v.vec_id,
        |    round(CASE WHEN q.q_n * v.n = 0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(generate_series(1, 64),
        |             i -> q.q_code[i] * v.code[i])) AS DOUBLE) / (q.q_n * v.n)
        |      END, 4) AS sim
        |  FROM q, cn v WHERE v.vec_id <> q.query_id
        |)
        |SELECT query_id, vec_id, sim, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id ASC) AS rk
        |  FROM scored
        |) WHERE rk <= 10""".stripMargin,
    "ann_lsh" -> annLshOracle,
    "ann_hamming" -> annHammingOracle,
    "ann_mmr" -> mmrOracle,
    "embedding_neardup_lsh" -> embeddingNearDupLshOracle,
    "embedding_neardup_incremental" -> embeddingNearDupIncrementalOracle,
    // the store-backed probe must emit EXACTLY the same pair set as the
    // recompute form — identical oracle, zero drift allowed
    "embedding_neardup_incremental_store" -> embeddingNearDupIncrementalOracle,

    "embedding_neardup" -> (normCte +
      """
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
        |         ELSE list_sum(list_transform(generate_series(1, 64),
        |                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |              / (a.nrm * b.nrm) END, 4) AS sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
        |         ELSE list_sum(list_transform(generate_series(1, 64),
        |                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |              / (a.nrm * b.nrm) END, 4) >= 0.4""".stripMargin)
    // ann_ivf's oracle is generated from the trained matrix, available
    // once the query pass has run (always true in Verify's dump order);
    // untrained/ambiguous → omitted, falling back to the rows-only check.
    // ann_ivf_store runs under the SAME oracle — the persisted inverted
    // file must return exactly the recompute form's top-k.
  ) ++ graft.operators.IvfIndex.trainedSnapshot(nlist = 16, iters = 2)
    .toList.flatMap { c =>
      val o = annIvfOracle(c, k = 10, nprobe = 4)
      Seq("ann_ivf" -> o, "ann_ivf_store" -> o,
        // recall@k: the brute and ivf oracles nested as CTEs — the
        // gate recomputes BOTH sides from scratch and intersects
        "ann_recall" -> s"""WITH brute AS (
$annBruteOracle
), ivf AS (
$o
)
SELECT b.query_id, count(i.vec_id)::BIGINT AS hits,
       round(count(i.vec_id) / 10.0, 4) AS recall
FROM brute b LEFT JOIN ivf i
  ON i.query_id = b.query_id AND i.vec_id = b.vec_id
GROUP BY b.query_id""",
        // the production MMR twin: the SAME greedy rounds over the
        // IVF shortlist oracle
        "ann_mmr_ivf" -> mmrOracleOver(o),
        // MRR/NDCG: the same two nested oracles, per-query rank math
        "ann_rank_metrics" -> s"""WITH brute AS (
$annBruteOracle
), ivf AS (
$o
), rel AS (
  SELECT i.query_id, i.rk FROM ivf i JOIN brute b
    ON b.query_id = i.query_id AND b.vec_id = i.vec_id
), idcg AS (
  SELECT query_id,
         sum(CAST(1.0 AS DOUBLE) / log2(rk + 1)) AS idcg
  FROM brute GROUP BY query_id
), per AS (
  SELECT query_id, count(*)::BIGINT AS n_hits,
         sum(CAST(1.0 AS DOUBLE) / log2(rk + 1)) AS dcg,
         min(rk) AS min_rk
  FROM rel GROUP BY query_id
)
SELECT g.query_id,
  coalesce(p.n_hits, 0)::BIGINT AS n_hits,
  round(coalesce(CAST(1.0 AS DOUBLE) / p.min_rk, 0.0), 4) AS mrr,
  round(coalesce(p.dcg / g.idcg, 0.0), 4) AS ndcg
FROM idcg g LEFT JOIN per p USING (query_id)""",
        // SemDeDup rides the same trained matrix; the store probe's
        // oracle is the self-dedup SQL plus the touching-batch filter
        "semantic_neardup" -> semanticNearDupOracle(c),
        "semantic_dedup_keep" -> semanticKeepOracle(c),
        "prune_prototypes" -> protoPruneOracle(c),
        // the stored inverted file's assignments must prune EXACTLY
        // like a fresh assignment pass — identical oracle
        "prune_prototypes_store" -> protoPruneOracle(c),
        "semantic_dedup_keep_far" -> semanticKeepFarOracle(c),
        "semantic_neardup_incremental_store" -> semanticIncrementalOracle(c),
        // the oracle recomputes cells from scratch, so the gate also
        // proves the STORE's ingest-time assignments match a fresh pass
        "ivf_cell_stats" -> (normCte + ",\n" + centCte(c) + ",\n" +
          vcellCte +
          "\nSELECT cell, count(*) AS n_vecs FROM vcell GROUP BY cell")) ++
        // IVF-PQ additionally needs the codebook snapshot; the store
        // probe must return exactly the recompute form's top-k
        graft.operators.IvfPq.trainedSnapshot(m = 8, ksub = 16, iters = 2)
          .toList.flatMap { cb =>
            val o = annIvfPqOracle(c, cb, k = 10, nprobe = 4)
            Seq("ann_ivfpq" -> o, "ann_ivfpq_store" -> o,
              // quantization-loss recall: brute and ADC oracles nested,
              // both sides recomputed from scratch and intersected
              "ann_recall_pq" -> s"""WITH brute AS (
$annBruteOracle
), pq AS (
$o
)
SELECT b.query_id, count(p.vec_id)::BIGINT AS hits,
       round(count(p.vec_id) / 10.0, 4) AS recall
FROM brute b LEFT JOIN pq p
  ON p.query_id = b.query_id AND p.vec_id = b.vec_id
GROUP BY b.query_id""",
              "ann_ivfpq_refine" -> annIvfPqRefineOracle(c, cb, k = 10,
                shortlist = 30, nprobe = 4))
          } ++
        graft.operators.IvfPq.trainedResidualSnapshot(m = 8, ksub = 16,
            iters = 2)
          .toList.map { cb =>
            "ann_ivfpq_res" -> annIvfPqResOracle(c, cb, k = 10, nprobe = 4)
          }
    } ++ graft.operators.Pca.trainedSnapshot(PcaK).toList.flatMap { m =>
      // the trained (mean, W) embedded as exact-double list literals —
      // the centroid-snapshot pattern; projection accumulates in the
      // same coordinate order as the native expression
      val meanList = "[" + m.mean.map(sqlDouble).mkString(", ") + "]"
      val wVals = m.components.zipWithIndex.map { case (row, j) =>
        s"(${j + 1}, [" + row.map(sqlDouble).mkString(", ") + "])"
      }.mkString(",\n    ")
      val projCtes =
        s"""pw(j, w) AS (VALUES
           |    $wVals),
           |pm(m) AS (VALUES ($meanList)),
           |pproj AS (
           |  SELECT e.vec_id, p.j,
           |    round(list_sum(list_transform(generate_series(1, 64),
           |      i -> (CAST(e.embedding[i] AS DOUBLE) - pm.m[i]) * p.w[i])), 6)
           |      AS val
           |  FROM embeddings e, pw p, pm
           |)""".stripMargin
      Seq(
        "embedding_pca" ->
          s"""WITH $projCtes
             |SELECT vec_id, CAST(j - 1 AS BIGINT) AS comp, val
             |FROM pproj""".stripMargin,
        // recall: brute ground truth nested, the PCA-space brute
        // ranking re-derived from the same projection CTEs (norms,
        // zero-guard, round-4 sims, (sim DESC, vec_id ASC) ties)
        "ann_pca_recall" -> s"""WITH brute AS (
$annBruteOracle
), $projCtes,
pvec AS (
  SELECT vec_id, list(val ORDER BY j) AS emb FROM pproj GROUP BY vec_id
),
pvn AS (
  SELECT vec_id, emb,
    sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
  FROM pvec
),
pq AS (
  SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm
  FROM pvn WHERE vec_id % 100 = 0
),
pscored AS (
  SELECT q.query_id, v.vec_id,
    round(CASE WHEN q.q_nrm * v.nrm = 0 THEN 0.0
      ELSE list_sum(list_transform(generate_series(1, $PcaK),
             i -> q.q_emb[i] * v.emb[i])) / (q.q_nrm * v.nrm) END, 4) AS sim
  FROM pq q, pvn v WHERE v.vec_id <> q.query_id
),
papprox AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY sim DESC, vec_id ASC) AS rk
    FROM pscored
  ) WHERE rk <= 10
)
SELECT b.query_id, count(p.vec_id)::BIGINT AS hits,
       round(count(p.vec_id) / 10.0, 4) AS recall
FROM brute b LEFT JOIN papprox p
  ON p.query_id = b.query_id AND p.vec_id = b.vec_id
GROUP BY b.query_id""")
    }
}
