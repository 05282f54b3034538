package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{BpeTokenizer, Dedup, IvfIndex, SimilaritySearch, TextAnalysis, UrlOps}

/** Scale-curve evidence (usage: ScaleCurve [sfDir]) — times the
  * flagship operators at 1× / 10× / 100× of the sf0.1 corpus and
  * prints one JSON line per (query, scale) with the warm wall time, so
  * BASELINE.md can record MEASURED scaling ratios instead of arguing
  * 100 TB behavior purely from plan shapes.
  *
  * The scaled corpus is the sf0.1 corpus replicated with per-replica
  * transforms that PRESERVE the workload's structure instead of
  * distorting it:
  * - documents: ids offset per replica; every token SUFFIXED with the
  *   replica index, so per-doc shape (length, token count, quality
  *   signals) is isomorphic but token/shingle spaces are DISJOINT
  *   across replicas — exact and near-dup cluster structure stays
  *   per-replica instead of every doc gaining artificial twins (a
  *   first attempt used token ROTATION, which preserves all interior
  *   trigrams: cross-replica Jaccard ~0.9, pair output exploded
  *   quadratically and the curve measured output amplification, not
  *   input scaling), and the vocabulary grows WITH the corpus — the
  *   realistic open-vocabulary regime the logprob/tfidf plans are
  *   designed for.
  * - embeddings: ids offset; a small per-replica additive perturbation
  *   keeps vectors distinct while preserving the space's geometry.
  * - ANN query set stays FIXED (replica 0's) — the curve measures
  *   corpus growth at constant query load.
  * Training (BPE merges, IVF centroids) runs once on the base corpus
  * and is excluded from timings — production trains once and serves
  * many, and the bounded-collect training cost is corpus-sublinear by
  * construction.
  */
object ScaleCurve {

  private def replicateDocs(docs: DataFrame, m: Int): DataFrame =
    (0 until m).map { k =>
      val salted =
        if (k == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"~$k"))), " ")
      docs.select((col("doc_id") + k * 100000000L).as("doc_id"),
        salted.as("text"), col("lang"), col("source"))
    }.reduce(_ unionByName _)

  /** Replication for the CURATION-pipeline row: the `~k` salt of
    * [[replicateDocs]] fails every replica at the quality gate (the
    * tilde+digit suffix kills alphaRatio AND de-stopwords the text —
    * measured: 0 of 5000 salted docs clear QualityMin), so the curve
    * would time gate-dropping, not pipeline scaling. This salt
    * preserves the quality signals — alphabetic suffix (alphaRatio
    * intact), quality stop-words left UNSALTED (stopRatio intact),
    * token count unchanged — while still making shingle spaces
    * effectively disjoint across replicas (any trigram touching a
    * salted token differs; all-stopword trigrams are rare), so the
    * curated survivor mass and near-dup structure scale WITH the
    * corpus instead of collapsing to replica 0's. */
  private def replicateDocsCurated(docs: DataFrame, m: Int): DataFrame = {
    val stops = TextAnalysis.stopEn
    (0 until m).map { k =>
      val salted =
        if (k == 0) col("text")
        else {
          // replica index encoded in letters ('b'..): alpha-only suffix
          val suffix = "x" + ('a' + (k % 26)).toChar.toString +
            ('a' + (k / 26 % 26)).toChar.toString
          array_join(transform(split(col("text"), " "),
            t => when(t.isin(stops: _*), t)
              .otherwise(concat(t, lit(suffix)))), " ")
        }
      docs.select((col("doc_id") + k * 100000000L).as("doc_id"),
        salted.as("text"), col("lang"), col("source"))
    }.reduce(_ unionByName _)
  }

  /** Events replication for the conversational rows: event ids AND
    * user ids offset per replica — user spaces are disjoint, so
    * session structure (and behavioral-duplicate structure) stays
    * per-replica and thread counts scale WITH the event log. Both ids
    * use the SAME 1e8 offset (ADVICE r14): a smaller user offset would
    * collide replica user spaces once base user ids reach it, silently
    * merging sessions across replicas and changing the rows' work
    * shape. */
  private def replicateEvents(events: DataFrame, m: Int): DataFrame =
    (0 until m).map { k =>
      events.select(
        (col("event_id") + k * 100000000L).as("event_id"),
        col("ts"),
        (col("user_id") + k * 100000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)

  private def replicateVecs(vecs: DataFrame, m: Int): DataFrame =
    (0 until m).map { k =>
      vecs.select((col("vec_id") + k * 100000000L).as("vec_id"),
        (if (k == 0) col("embedding")
         else transform(col("embedding"),
           x => x + lit((k * 0.0011).toFloat))).as("embedding"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional second arg: comma-separated row names — run only those
    // (local iteration; a full run measures everything)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(',').toSet) else None
    val spark: SparkSession = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val baseDocs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source")
    val baseVecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    // train once on the base corpus (excluded from timings)
    val merges = BpeTokenizer.trainCached(baseDocs, sfDir, "text",
      graft.packs.TextOps.MaxBpeWords, graft.packs.TextOps.NumBpeMerges)
    val centroids = IvfIndex.trainCached(baseVecs, sfDir, nlist = 16)
    // NB statistics collapse to ≤ 2·dim rows at ANY corpus size, so
    // training is corpus-sublinear by the same argument as BPE/IVF —
    // trained once on the base corpus, untimed
    val nbModel = graft.operators.NbClassifier.trainCached(
      baseDocs, sfDir, "doc_id", "text")
    // unigram-LM model: bounded driver fit like BPE/IVF/NB — untimed
    val uniModel = graft.operators.UnigramLmTokenizer.trainCached(
      baseDocs, sfDir, "text", graft.packs.TextOps.MaxBpeWords,
      graft.packs.TextOps.UnigramVocabTarget)
    // WordPiece vocabulary: same bounded driver fit — untimed
    val wpModel = graft.operators.WordPieceTokenizer.trainCached(
      baseDocs, sfDir, "text", graft.packs.TextOps.MaxBpeWords,
      graft.packs.TextOps.NumBpeMerges)
    // decontamination bench side: the held-out split's distinct
    // shingles are benchmark-sized (FIXED as the corpus grows — eval
    // suites don't scale with training data), built once, untimed
    val benchShingles = baseDocs
      .filter(col("doc_id") % graft.packs.TextOps.ContamBenchMod ===
        graft.packs.TextOps.ContamBenchRem)
      .select(explode(array_distinct(graft.functions.WordShingles(
        col("text"), graft.packs.TextOps.ContamShingleN))).as("s"))
      .distinct().localCheckpoint(true)
    val queries = baseVecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .localCheckpoint(true)

    // noop sink, NOT count(): count() collapses to a zero-column
    // aggregate and Catalyst prunes the very projections under test
    // (a scan-side expression benchmarked through count() measures
    // nothing); the noop writer computes every output column
    def bench(name: String, scale: Int, df: => DataFrame): Unit = {
      if (!only.forall(_.contains(name))) return
      def run(): Unit =
        df.write.format("noop").mode("overwrite").save()
      run() // warm-up pass (JIT + AQE stats)
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = df.count()
      println(f"""{"query":"$name","scale":$scale,"rows":$rows,"sec":$sec%.3f}""")
    }

    for (m <- Seq(1, 10, 100)) {
      val docs = replicateDocs(baseDocs, m).localCheckpoint(true)
      val vecs = replicateVecs(baseVecs, m).localCheckpoint(true)
      bench("dedup_exact", m, Dedup.exact(docs, "doc_id", "text"))
      bench("dedup_minhash", m, Dedup.minhashLsh(docs, "doc_id", "text"))
      bench("quality_floor", m,
        TextAnalysis.qualityFloor(docs, "doc_id", "text", 0.6))
      bench("pack_sequences", m,
        TextAnalysis.packSequences(docs, "doc_id", "text", 8, 256))
      bench("unigram_logprob", m,
        TextAnalysis.unigramLogProb(docs, "doc_id", "text"))
      bench("token_count_bpe", m, docs.select(col("doc_id"),
        graft.functions.BpeTokenCount(col("text"), merges).as("n")))
      // trained-classifier inference: one-pass scan-side scoring, the
      // model riding along as one dim-long array; the salted replicas
      // are all-OOV for it — the open-vocabulary (memo-cold) regime
      bench("classifier_score", m, docs.select(col("doc_id"),
        graft.operators.NbClassifier.scoreExpr(col("text"), nbModel)
          .as("clf_score")))
      bench("gopher_rules", m,
        TextAnalysis.gopherRules(docs, "doc_id", "text"))
      bench("url_canonicalize", m, UrlOps.urlCanonicalize(
        docs.select(col("doc_id"),
          concat(lit("https://www."), col("source"), lit(".co.uk/p/"),
            col("doc_id").cast("string")).as("url")), "doc_id", "url"))
      // the FULL-PSL path: ~11 broadcast rule probes per row, including
      // the wildcard branch — the 9.5k-rule table rides along broadcast,
      // the corpus never shuffles
      bench("url_canonicalize_psl", m, UrlOps.etld1Psl(
        docs.select(col("doc_id"),
          concat(lit("www."), col("source"),
            when(col("doc_id") % 3 === 0, lit(".foo.ck"))
              .when(col("doc_id") % 3 === 1, lit(".co.uk"))
              .otherwise(lit(".com"))).as("host")), "host"))
      bench("bpe_encode_ids", m, docs.select(col("doc_id"),
        posexplode(graft.functions.BpeTokenIds(col("text"), merges))))
      // Viterbi encode on the salted replicas: every salted word is
      // OOV (memo-cold, UNK-heavy) — the open-vocabulary worst case
      bench("unigram_encode_ids", m, docs.select(col("doc_id"),
        posexplode(graft.functions.UnigramTokenIds(col("text"),
          uniModel.table))))
      // greedy longest-match encode on the salted replicas: the salt
      // char is outside the trained alphabet, so every salted word is
      // whole-word UNK — this times the scan + probe cascade floor;
      // replica 0 carries the full-coverage path
      bench("wordpiece_encode_ids", m, docs.select(col("doc_id"),
        posexplode(graft.functions.WordPieceTokenIds(col("text"),
          wpModel.table))))
      // paragraph scrub: unit explode is scan-side; the keeper argmin
      // shuffles the open key domain once — salted replicas' windows
      // are key-disjoint across replicas, so dup structure (and output
      // mass) scales linearly WITH the corpus
      bench("paragraph_scrub", m,
        graft.operators.Paragraphs.scrubByWindow(docs, "doc_id", "text"))
      // winnowing: gram hash is scan-side, the window minimum is
      // per-DOC ordered frames, the rightmost-tie join is bucketed
      // (≤ 2w rows meet each window end) — everything doc-bounded, so
      // the sketch should scale linearly with the corpus
      bench("fingerprint_winnow", m,
        Dedup.winnowFingerprints(docs, "doc_id", "text"))
      // MOSS pairing over the sketch: salted replicas' gram spaces are
      // disjoint, so shared-fingerprint structure stays per-replica and
      // pair output scales linearly; the hot cap bounds any degenerate
      bench("dedup_winnow", m, Dedup.winnowPairs(docs, "doc_id", "text"))
      // the 100× winnow story: a FIXED batch probed against the
      // PERSISTED fingerprint sketch (ingested once, untimed) — probe
      // cost = batch winnowing + the capped candidate join against a
      // pre-bucketed store scan; the sketch is ~2/(w+1) the size of
      // the gram table the span store keeps for the same corpus
      locally {
        val store = new graft.operators.WinnowStore(s"graft_scale_winnow_$m")
        store.ingest(docs, "doc_id", "text")
        val probeBatch = baseDocs.filter(col("doc_id") % 101 === 0)
          .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text"))
          .localCheckpoint(true)
        bench("winnow_store_probe", m,
          store.probe(probeBatch, "doc_id", "text"))
        probeBatch.unpersist()
      }
      // BM25 at a fixed query workload over the growing corpus: the
      // posting restriction keeps everything downstream of the
      // tokenize+semi-join scan bounded by matches (the salted
      // replicas' tokens never match the base query terms — N/avgdl
      // grow, df and the match set stay base-sized: the honest
      // fixed-queries regime)
      locally {
        import spark.implicits._
        val qt = graft.packs.TextOps.Bm25Queries.toDF("query_id", "term")
          .localCheckpoint(true)
        bench("bm25_search", m,
          TextAnalysis.bm25Search(docs, "doc_id", "text", qt))
        // the serving form: the SAME ranking from the PERSISTED posting
        // table (ingested once, untimed) — query-time work is the
        // pruned posting scan + |Q|-key aggs, zero re-tokenization
        val store = new graft.operators.LexStore(s"graft_scale_lex_$m")
        store.ingest(docs, "doc_id", "text")
        bench("bm25_store_probe", m, store.bm25(qt))
        qt.unpersist()
      }
      // edit-distance verification of the capped simhash candidates:
      // candidate volume is per-replica (disjoint shingles), the
      // O(len²) distance runs once per candidate — linear in pairs
      bench("dedup_editdistance", m,
        Dedup.editDistancePairs(docs, "doc_id", "text"))
      // z-order assignment: pure scan-side integer projection — the
      // flattest row on the curve by construction
      bench("layout_zorder", m,
        TextAnalysis.layoutZorder(docs, "doc_id", "text"))
      // weighted WOR: bounded explode (≤ 10 hashes/doc), per-doc max
      // partial agg, bounded-heap top-k per source — no window, linear
      bench("weighted_sample_wor", m,
        TextAnalysis.weightedSampleWor(docs, "doc_id", "text", "source"))
      // span decontamination: the corpus-side positional probe scales,
      // the bench membership side is fixed — hit mass stays bounded by
      // the benchmark (salted replicas share no shingle with it)
      bench("decontaminate_spans", m,
        TextAnalysis.contaminationSpansFrom(docs, benchShingles,
          "doc_id", "text", graft.packs.TextOps.ContamShingleN))
      // blocklist tagging: scan-side k-gram enumeration × broadcast
      // dictionary — the salted replicas never match (their tokens
      // carry the ~k suffix), so hit mass stays replica-0-sized while
      // the scan grows; the row times the scan, which is the claim
      bench("blocklist_tag", m,
        graft.operators.Blocklist.tagVerdict(docs, "doc_id", "text"))
      // drift, recompute form: both sides tokenize + one (word)-keyed
      // full-outer merge — vocabulary grows with the corpus (disjoint
      // per-replica token spaces), exactly the open-vocabulary regime
      // the histogram shuffle must survive
      bench("drift_vs_corpus", m,
        TextAnalysis.jsDriftVsCorpus(
          docs.filter(col("doc_id") % 5 === 0), "text",
          TextAnalysis.wordCounts(
            docs.filter(col("doc_id") % 5 =!= 0), "text")))
      // drift, store-probe form: the baseline folds from persisted
      // postings (sum(tf) by term — corpus-linear by design: a monitor
      // reads its whole baseline), the batch side tokenizes only
      // itself. Ingest is untimed train-once cost, guarded so targeted
      // runs of other rows never pay the 100x store build.
      if (only.forall(_.contains("drift_store_probe"))) locally {
        val store = new graft.operators.LexStore(s"graft_curve_drift_$m")
        store.ingest(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text")
        val seenCounts = store.table(spark)
          .filter(col("term").isNotNull)
          .groupBy(col("term")).agg(sum(col("tf")).as("n"))
          .select(col("term").as("word"), col("n"))
        bench("drift_store_probe", m,
          TextAnalysis.jsDriftVsCorpus(
            docs.filter(col("doc_id") % 5 === 0), "text", seenCounts))
      }
      bench("ann_brute_heap", m,
        SimilaritySearch.bruteForceTopKHeap(vecs, queries, k = 10))
      bench("ann_ivf", m,
        IvfIndex.topK(vecs, queries, centroids, k = 10, nprobe = 4))
      // the text→vector→near-dup bridge: chunking and embedding are
      // scan-side (all scales); the LSH pair path is measured to 10×
      // only — its candidate volume on this salted corpus is bounded by
      // the bucket caps, but 100× would mostly measure cap churn
      val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 32, 8)
        .select((col("doc_id") * graft.packs.TextOps.ChunkVecBase + col("chunk_idx")).as("vec_id"),
          col("text"))
      bench("chunk_documents", m, chunks)
      bench("chunk_hash_embed", m, chunks.select(col("vec_id"),
        graft.functions.HashEmbed(col("text"), 64).as("embedding")))
      if (m <= 10)
        bench("text_neardup_lsh", m,
          SimilaritySearch.lshNearDupPairs(
            chunks.select(col("vec_id"),
              graft.functions.HashEmbed(col("text"), 64).as("embedding")),
            threshold = 0.95, maxBucketSize = 250))
      // the 100× text near-dup story is the STORE-BACKED probe, not the
      // full self-join: the seen corpus's chunk buckets + pre-normed
      // vectors are ingested ONCE (untimed — production amortizes the
      // ingest across the stream) and each arriving batch pays only
      // batch-sized hashing plus the capped bucket join against the
      // persisted tables. Probe batch FIXED across scales (replica 0's
      // every-101st doc, ids offset clear of every replica) — corpus
      // growth at constant batch load, same regime as the ANN rows.
      locally {
        // 16 hyperplanes, not the gate default 8: the bucket space must
        // scale with the corpus (8 planes = 256 sign buckets per table
        // — saturated by ~1M chunks, every bucket over the 250 cap and
        // recall collapses to zero, measured). 65k buckets keeps mean
        // occupancy ~18 at 100× — exactly the production tuning knob
        // the store exposes for this.
        val store = new graft.operators.EmbStore(
          s"graft_scale_textemb_$m", nPlanes = 16)
        store.ingest(chunks.select(col("vec_id"),
          graft.functions.HashEmbed(col("text"), 64).as("embedding")))
        val probeBatch = TextAnalysis.chunkDocuments(
            baseDocs.filter(col("doc_id") % 101 === 0)
              .select((col("doc_id") + 1000000000000L).as("doc_id"),
                col("text")),
            "doc_id", "text", 32, 8)
          .select((col("doc_id") * graft.packs.TextOps.ChunkVecBase +
              col("chunk_idx")).as("vec_id"),
            graft.functions.HashEmbed(col("text"), 64).as("embedding"))
          .localCheckpoint(true)
        bench("text_neardup_store_probe", m,
          store.probe(probeBatch, threshold = 0.95, maxBucketSize = 250))
        probeBatch.unpersist()
      }
      // the flagship raw-docs→training-shards composition (curate →
      // strip → BPE tokenize → physical shard slots) on the curated-
      // structure-preserving replicas: survivor mass, near-dup
      // clusters and the packed token stream all scale WITH the
      // corpus; the trained merge table is the base-corpus one
      // (trained once, serves many — the production split)
      locally {
        val curatedDocs = replicateDocsCurated(baseDocs, m)
          .localCheckpoint(true)
        bench("pipeline_curate_pack_ids", m,
          graft.packs.PipelineOps.curatePackIds(curatedDocs, merges))
        // the CCNet chain end to end (paragraph scrub → LM floor on the
        // scrubbed text → mixture → near-dup keep) on the same curated
        // replicas: the base-trained unigram LM segments salted words
        // via their (in-alphabet) characters at high cost, but the
        // floor is corpus-RELATIVE — it keeps the best 60% of WHATEVER
        // arrives, so survivor mass scales with the corpus; the
        // quality-preserving salt keeps near-dup structure per-replica
        bench("pipeline_curate_ccnet", m,
          graft.packs.PipelineOps.curateCcnet(curatedDocs, uniModel.table))
        // the MASTER composition (classifier gate → scrub → LM floor →
        // mixture → LSH keep, gopher verdict riding as a flag) on the
        // same curated replicas — the flagship all-families row; both
        // trained models are the base-corpus ones (train once, serve
        // many)
        bench("pipeline_curate_master", m,
          graft.packs.PipelineOps.curateMaster(curatedDocs,
            uniModel.table, nbModel))
        // the blocklist-fronted composition end to end (C4 gate first,
        // then the quality-keep body): the gate's k-gram scan grows
        // with the corpus while hit mass stays replica-0-sized (salted
        // tokens never match the broadcast dictionary), so the keep
        // set — and everything the quality body does after it —
        // scales WITH the corpus
        bench("pipeline_curate_blocklist", m,
          graft.packs.PipelineOps.curateBlocklist(curatedDocs))
        // attribution row for the master's flag stage: the composite
        // Gopher verdict alone (4 scan families over the replicas)
        bench("gopher_verdict", m,
          graft.packs.TextOps.gopherVerdictOf(curatedDocs))
        curatedDocs.unpersist()
      }
      // the conversational family over the replicated event log:
      // per-user windows (state bounded by a user's history, users
      // disjoint per replica), thread dedup on md5 of the serialized
      // threads, the composed pipeline = both plus one semi-join
      locally {
        val events = replicateEvents(Tables.events(spark, sfDir), m)
          .localCheckpoint(true)
        bench("assemble_threads", m,
          graft.packs.WindowOps.assembleThreadsOn(events))
        bench("thread_dedup", m,
          graft.packs.WindowOps.threadDedupOn(events))
        // the SFT extraction stage: stateless pairing over the
        // assembled turn arrays — per-user work, users disjoint per
        // replica, so pair mass scales with the log
        bench("thread_turn_pairs", m,
          graft.packs.WindowOps.threadTurnPairsOn(events))
        bench("pipeline_curate_threads", m,
          graft.packs.WindowOps.pipelineCurateThreadsOn(events))
        // exact vs sketch quantiles over the growing log — the r15
        // percentiles_approx story measured: the exact aggregate
        // buffers EVERY group value (state linear in the corpus), the
        // GK summary holds O(accuracy) per group with map-side combine.
        // Same grouping, same cents scaling as the gated pair.
        val cents = events.select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        bench("percentiles_exact", m, cents.groupBy(col("event_type"))
          .agg(expr("percentile(cents, array(0.5D, 0.95D))").as("p")))
        bench("percentiles_approx", m, cents.groupBy(col("event_type"))
          .agg(expr("approx_percentile(cents, array(0.5D, 0.95D), " +
            s"${graft.packs.RelationalOps.ApproxPctAccuracy})").as("p")))
        events.unpersist()
      }
      // the hybrid SERVING probe at a grown store: ingest is the
      // train-once/serve-many side (untimed — one corpus pass per
      // store, exactly like the BPE/IVF fits above); the timed path is
      // the served query over the persisted segments: posting-pruned
      // keyword probe (bounded by MATCHING postings — the salted
      // replicas share no tokens with the fixed query set, so lexical
      // work stays replica-0-sized while the store grows 100×) fused
      // with pre-normed brute dense scoring (corpus-linear by design —
      // the baseline an IVF shortlist replaces at this seam). Ids here
      // exceed the gate twin's query-id offset scheme (replica offsets
      // are 1e8); the curve ingests raw ids — timing-isomorphic, and
      // the id discipline is the GATE's concern, enforced there by the
      // in-plan raise_error.
      // ingest guarded by the row filter: a targeted run of OTHER rows
      // must not pay the 100× store build
      if (only.forall(_.contains("hybrid_search_rrf_store_probe"))) locally {
        val lexStore = new graft.operators.LexStore(s"graft_curve_lex_$m")
        lexStore.ingest(docs, "doc_id", "text")
        val embStore = new graft.operators.EmbStore(s"graft_curve_emb_$m")
        embStore.ingest(docs.select(col("doc_id").as("vec_id"),
          graft.functions.HashEmbed(col("text"),
            graft.packs.TextOps.EmbedDim).as("embedding")))
        bench("hybrid_search_rrf_store_probe", m,
          graft.packs.TextOps.hybridStoreProbe(spark, lexStore, embStore))
      }
      // the IVF-SERVED hybrid probe at the same grown store — the
      // replacement measured against the brute row above at the same
      // seam: the dense side joins |q|·nprobe broadcast cells against
      // the bucketed inverted file instead of scoring every stored
      // vector, so probe work is bounded by the PROBED CELLS' share of
      // the store (nprobe/nlist of it, on this uniform corpus) while
      // the brute side grows corpus-linearly. Quantizer trained once
      // on the base corpus (frozen-centroid faiss semantics — the
      // curve measures store growth at constant query load, and the
      // salted replicas stay inside the trained space's geometry);
      // ingest (assignment pass + store build) is the untimed
      // train-once side, guarded like the other store rows.
      if (only.forall(_.contains("hybrid_search_rrf_store_ivf_probe"))) locally {
        val lexStore = new graft.operators.LexStore(s"graft_curve_lexiv_$m")
        lexStore.ingest(docs, "doc_id", "text")
        val docVecs = docs.select(col("doc_id").as("vec_id"),
          graft.functions.HashEmbed(col("text"),
            graft.packs.TextOps.EmbedDim).as("embedding"))
        val hybCentroids = IvfIndex.trainCached(
          Tables.documents(spark, sfDir).select(col("doc_id").as("vec_id"),
            graft.functions.HashEmbed(col("text"),
              graft.packs.TextOps.EmbedDim).as("embedding")),
          sfDir + "#curvehybrid",
          nlist = graft.packs.TextOps.HybridIvfNlist,
          iters = graft.packs.TextOps.HybridIvfIters)
        val ivfStore = new graft.operators.IvfStore(s"graft_curve_hivf_$m")
        ivfStore.merge(IvfIndex.index(docVecs, hybCentroids))
        bench("hybrid_search_rrf_store_ivf_probe", m,
          graft.packs.TextOps.hybridIvfStoreProbe(spark, lexStore,
            ivfStore, hybCentroids))
      }
      // the same probe with the quantizer RETRAINED at corpus scale —
      // faiss's √N-cells practice, the offline side the
      // IvfStore.rebuild primitive exists for: nlist grows ~16·√m
      // (16/50/160) so the probed mass (nprobe/nlist of the store)
      // SHRINKS as the store grows and the dense scoring stays
      // ~constant-cell-sized. The frozen-quantizer row above measures
      // the other operating point (gate-scale nlist pinned at 16,
      // where nprobe/nlist = 25% of the store is still scored).
      // Training stays the bounded ≤4096-sample driver fit — corpus-
      // sublinear at any scale, untimed train-once cost like the rest.
      if (only.forall(_.contains("hybrid_search_rrf_store_ivf_probe_nscaled")))
      locally {
        val lexStore = new graft.operators.LexStore(s"graft_curve_lexns_$m")
        lexStore.ingest(docs, "doc_id", "text")
        val docVecs = docs.select(col("doc_id").as("vec_id"),
          graft.functions.HashEmbed(col("text"),
            graft.packs.TextOps.EmbedDim).as("embedding"))
        val nlistScaled = Map(1 -> 16, 10 -> 50, 100 -> 160)(m)
        val cScaled = IvfIndex.trainCached(docVecs,
          sfDir + s"#curvehybridns$m", nlist = nlistScaled,
          iters = graft.packs.TextOps.HybridIvfIters)
        val ivfStore = new graft.operators.IvfStore(s"graft_curve_hivfns_$m")
        ivfStore.merge(IvfIndex.index(docVecs, cScaled))
        bench("hybrid_search_rrf_store_ivf_probe_nscaled", m,
          graft.packs.TextOps.hybridIvfStoreProbe(spark, lexStore,
            ivfStore, cScaled))
      }
      docs.unpersist()
      vecs.unpersist()
    }
    spark.stop()
  }
}
