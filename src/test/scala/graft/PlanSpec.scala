package graft

import graft.operators.TextAnalysis

/** Physical-plan regression guards: the scale-critical plan properties
  * (pushdown, pruning, broadcast selection, top-k, map-side partial
  * aggregation, shuffle-free scans) asserted as substring checks on the
  * executed plan. If a refactor silently turns a broadcast join into a
  * shuffle join or un-pushes a filter, these fail. */
class PlanSpec extends SparkSpec {

  // benchQueries ⊇ queries: the bench-only engine-hash twins
  // (dedup_*_xxh64) carry the same scale pins as their gated siblings
  private def plan(name: String): String =
    SparkEntry.benchQueries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1_agg: filter pushed to parquet, columns pruned, partial agg") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_partkey"), "unused columns must be pruned from the scan")
    assert(p.contains("partial_sum"), "map-side partial aggregation expected")
  }

  test("join_broadcast: dim side broadcast, fact scan pruned") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("o_orderdate"), "unused order columns must be pruned")
  }

  test("multi_join: all dims broadcast; only the fact-fact join shuffles") {
    val p = plan("multi_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
  }

  test("sort_limit: top-k via TakeOrderedAndProject, no global sort") {
    val p = plan("sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"),
      "global range-partitioned sort must not appear for a limited sort")
  }

  test("text_stats: single shuffle-free codegen'd projection over pruned scan") {
    val p = plan("text_stats")
    assert(!p.contains("Exchange"), "text stats must not shuffle")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("windowed_avg: partial aggregation before the window-key exchange") {
    val p = plan("windowed_avg")
    assert(p.contains("partial_average") || p.contains("partial_avg") ||
      p.contains("partial_sum") || p.contains("partial_count"),
      s"expected partial aggregation in:\n$p")
  }

  test("ann_brute: query side broadcast (nested-loop over broadcast, no cartesian shuffle)") {
    val p = plan("ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
  }

  test("asof_join: ONE hash-partition exchange (union-tag sort, no range-join blowup)") {
    val p = plan("asof_join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"as-of must cost exactly one shuffle on the key, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not fall back to a per-pair join")
  }

  test("ann_ivf: probe side broadcast, no cartesian, native assign expression") {
    val p = plan("ann_ivf")
    assert(p.contains("BroadcastExchange"), s"probe side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("graft_ivf_assign"),
      "cell assignment must be the native reference-object expression")
  }

  test("dedup_minhash (md5 gate + xxh64 twin): bucket equi-join, never a cartesian/nested-loop pair join") {
    Seq("dedup_minhash", "dedup_minhash_xxh64").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q LSH banding must make candidate generation an equi-join:\n$p")
      // the bucket cap must be a partial-agg count + broadcast anti-join —
      // a window count has no partial aggregation and AQE cannot split a
      // window partition, so a degenerate boilerplate bucket would funnel
      // ALL its rows into one task just to count-and-drop them
      assert(!p.contains("windowspecdefinition"),
        s"$q bucket cap must not ride a window count:\n$p")
      assert(p.contains("LeftAnti"),
        s"$q oversized buckets must be dropped via an anti-join:\n$p")
    }
  }

  test("pack_ids_incremental_store: durable prefix + broadcast bases + late explode") {
    val p = plan("pack_ids_incremental_store")
    // the sink0 parquet is the only relation carrying seq_first in its
    // read schema — batch 0's placement is READ back from the durable
    // sink write, never re-packed
    assert("ReadSchema:[^\\n]*seq_first".r.findFirstIn(p).isDefined,
      s"batch 0's placement must come from its materialized sink parquet, not a re-pack:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the <=nShards base-offset rows must broadcast:\n$p")
    assert(p.contains("Generate"),
      s"ids must posexplode AFTER the doc-level placement join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("bpe_encode_ids(+_bytes): exchange-free scan-side tokenize + explode") {
    // the id stream is emitted where the text is read — a shuffle here
    // would exchange the TOKEN stream (corpus × fertility rows) instead
    // of nothing; both denominations must keep the projection+Generate
    // shape (the merge table rides inside the expression, broadcast by
    // construction)
    Seq("bpe_encode_ids", "bpe_encode_ids_bytes").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
      assert(p.contains("Generate"), s"$q must posexplode scan-side:\n$p")
    }
  }

  test("dedup_ngram_jaccard: block cap is partial-agg + anti-join, not a window count") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("windowspecdefinition"),
      s"block cap must not ride a window count:\n$p")
    assert(p.contains("LeftAnti"),
      s"oversized blocks must be dropped via an anti-join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"block sizes must be map-side partially aggregated:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix blocking must make candidate generation an equi-join:\n$p")
  }

  test("temperature_sample: rates broadcast back, corpus never key-shuffled") {
    val p = plan("temperature_sample")
    // the per-source rate table and the 1-row total must both broadcast;
    // the corpus side of the gate join may not shuffle
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"rates must broadcast onto the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle for the rate join:\n$p")
    // the doc-count form is mass = lit(1) through the shared mass body,
    // so the per-source reduction plans as partial_sum(1) (r13); either
    // spelling is the map-side partial aggregation under test
    assert(p.contains("partial_count") || p.contains("partial_sum(1)"),
      s"per-source mass must partially aggregate map-side:\n$p")
  }

  test("quality_floor: histogram partial-agg, cutoff broadcast, corpus never key-shuffled") {
    val p = plan("quality_floor")
    // the only window runs over the value-domain-bounded histogram;
    // the corpus-side cutoff join must broadcast
    assert(p.contains("partial_count"),
      s"score histogram must partially aggregate map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the scalar cutoff must broadcast onto the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle for the cutoff join:\n$p")
  }

  test("quality_floor_by_lang: per-group window on histogram only, corpus never key-shuffled") {
    val p = plan("quality_floor_by_lang")
    assert(p.contains("partial_count"),
      s"grouped score histogram must partially aggregate map-side:\n$p")
    // the cumulative window must be partitioned (per group over the
    // bounded histogram) — a global window here would be the unbounded
    // single-task shape the decomposition exists to avoid
    assert(p.contains("windowspecdefinition(lang"),
      s"the cumulative window must be partitioned by the group column:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the per-group cutoff table must broadcast onto the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle for the cutoff join:\n$p")
  }

  test("dedup_keep_quality: argmax is a partial agg, never a per-cluster window") {
    val p = plan("dedup_keep_quality")
    assert(!p.contains("windowspecdefinition"),
      s"canonical selection must not ride a per-cluster window:\n$p")
    assert(p.contains("partial_max"),
      s"the per-cluster argmax must partially aggregate map-side:\n$p")
  }

  test("dedup_incremental_bloom: native scan-side gate, seen corpus never shuffle-joined") {
    val p = plan("dedup_incremental_bloom")
    assert(p.contains("graft_bloom_contains"),
      s"the bloom gate must be the native reference-object expression:\n$p")
    // the seen side participates only via broadcast semi/anti joins —
    // a sort-merge or shuffled-hash join would re-shuffle the corpus
    // hash set on every ingest batch
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the seen corpus must never shuffle for the confirm join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"maybe-set and confirmed-dup set must broadcast:\n$p")
  }

  test("dedup_simhash (md5 gate + xxh64 twin): band-bucket cap is partial-agg + anti-join, not a window count") {
    Seq("dedup_simhash", "dedup_simhash_xxh64").foreach { q =>
      val p = plan(q)
      assert(!p.contains("windowspecdefinition"),
        s"$q simhash bucket cap must not ride a window count:\n$p")
      assert(p.contains("LeftAnti"),
        s"$q oversized simhash band buckets must be dropped via an anti-join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q simhash banding must make candidate generation an equi-join:\n$p")
    }
  }

  test("embedding_neardup_lsh (+incremental): bucket cap is partial-agg + anti-join, not a window count") {
    Seq("embedding_neardup_lsh", "embedding_neardup_incremental").foreach { q =>
      val p = plan(q)
      assert(!p.contains("windowspecdefinition"),
        s"$q bucket cap must not ride a window count:\n$p")
      assert(p.contains("LeftAnti"),
        s"$q oversized buckets must be dropped via an anti-join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q bucketing must make candidate generation an equi-join:\n$p")
    }
  }

  test("ann_lsh + ann_ivf + ann_ivfpq(+refine): heap top-k with map-side combine, never a ranking window") {
    // a hot query hitting a degenerate LSH bucket / dense IVF cell must
    // not funnel its full candidate set into one unsplittable window
    // task — the bounded-heap aggregate partially combines map-side
    Seq("ann_lsh", "ann_ivf", "ann_ivfpq", "ann_ivfpq_refine").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_graft_topk"),
        s"$q must rank via the bounded-heap aggregate (map-side combine):\n$p")
      assert(!p.contains("windowspecdefinition"),
        s"$q must not rank via a per-query window:\n$p")
    }
  }

  test("ann_ivfpq: ADC scoring native, probe side broadcast, no cartesian") {
    val p = plan("ann_ivfpq")
    assert(p.contains("graft_pq_adc_dot"),
      s"ADC must be the native reference-object expression:\n$p")
    assert(p.contains("BroadcastExchange"), s"probe side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("semantic_neardup: cell cap is partial-agg + anti-join, not a window count") {
    val p = plan("semantic_neardup")
    // (the cell assignment itself sits behind the indexed table's lazy
    // localCheckpoint — one materialization feeding cap count, both
    // join sides, and verification — so it does not appear here; the
    // SemDedupSpec store-probe pin covers the zero-recompute property)
    assert(p.contains("partial_count"),
      s"cell sizes must partially aggregate map-side:\n$p")
    assert(p.contains("LeftAnti") || p.contains("left_anti"),
      s"over-cap cells must drop via broadcast anti-join:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window may count cell sizes:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("range_join: binned equi-join, never a nested-loop inequality join") {
    val p = plan("range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join must bucket into an equi-join:\n$p")
  }

  test("simhash fingerprints: scan-side projection, no explode, no shuffle") {
    val p = graft.operators.Dedup
      .simhash(Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"simhash must not shuffle:\n$p")
    assert(!p.contains("Generate"), s"simhash must not explode tokens:\n$p")
    assert(p.contains("graft_simhash64"), s"expected the native expression in:\n$p")
  }

  test("stratified_sample: scan-side filter, no shuffle, pruned scan") {
    val p = plan("stratified_sample")
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"scan must read only (doc_id, lang):\n$p")
  }

  test("tfidf_top_terms: df via partial-agg shuffle join — no vocab broadcast, no term window") {
    val p = plan("tfidf_top_terms")
    // the open vocabulary of a 100 TB corpus is tens of GB — the df
    // side must NEVER broadcast; only the 1-row corpus count may
    assert(!p.contains("BroadcastHashJoin"),
      s"df must come from a shuffle join, not a broadcast join:\n$p")
    // ... and must not be a term-partitioned window either: WindowExec
    // has no partial aggregation and AQE cannot split a window
    // partition, so a stopword term would funnel ~N_docs rows into one
    // straggler task. The doc_id top-k window is the only one allowed.
    assert(!p.contains("windowspecdefinition(term"),
      s"df must not ride a term-partitioned window:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the tf⋈df join must be a skew-splittable shuffle join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"df must be map-side partially aggregated before its shuffle:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row corpus count should still broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"1-row cross join must broadcast:\n$p")
  }

  test("dsir_select: bounded hashed model broadcasts, heap top-N, no window") {
    val p = plan("dsir_select")
    // the hashed-feature model is ≤ DsirBuckets rows BY CONSTRUCTION —
    // broadcasting it is the point (contrast unigram_logprob, whose
    // open vocabulary must merge-join); the scoring join must be the
    // broadcast, never a corpus-side shuffle join on bucket
    assert(p.contains("BroadcastHashJoin"),
      s"bucket log-ratio table must broadcast onto the tf rows:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N selection must be per-partition heaps, not a global sort:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort for the limited selection:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no ranking window anywhere in the DSIR plan:\n$p")
    // r17: the tf relation is lazily checkpointed inside dsirSelect
    // (two consumers), so its aggregation no longer appears in the
    // FINAL plan — pin the map-side partial agg on the tf builder's
    // own plan instead
    val tfp = graft.operators.TextAnalysis
      .dsirTf(Tables.documents(spark, sf), "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en",
        graft.operators.TextAnalysis.DsirBuckets)
      .queryExecution.executedPlan.toString
    assert(tfp.contains("partial_count"),
      s"(doc, bucket) tf must partially aggregate map-side:\n$tfp")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row totals cross join must broadcast:\n$p")
  }

  test("prune_prototypes_store: scores the persisted assignments, no re-assignment") {
    val p = plan("prune_prototypes_store")
    // the probe form's reason to exist: the assignment argmin is paid
    // once at ingest — it must never appear above the stored scan
    assert(!p.contains("graft_ivf_assign"),
      s"store-backed pruning must not re-assign the corpus:\n$p")
    assert(p.contains("graft_ivf_store_"),
      s"probe must scan the persisted inverted file:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("unigram_logprob: term totals via merge join — no vocab broadcast, no term window") {
    val p = plan("unigram_logprob")
    // same open-vocabulary discipline as tfidf_top_terms: the term-count
    // side must never broadcast and never ride a term-partitioned window
    assert(!p.contains("BroadcastHashJoin"),
      s"term totals must come from a shuffle join, not a broadcast join:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window anywhere in the logprob plan:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the tf⋈tc join must be a skew-splittable shuffle join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"(doc, term) counts must partially aggregate map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row (N, V) total should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"1-row cross join must broadcast:\n$p")
  }

  test("bigram_logprob: same open-vocabulary discipline — merge joins, no vocab broadcast, no window") {
    // r18: the REGISTERED query's dimension-join strategy is now scale-
    // guarded (TextAnalysis.bigramSmallDims): on a narrow input the
    // merge hints come off so AQE may broadcast the small word table.
    // The open-vocabulary discipline this test pins is the CORPUS-SCALE
    // plan — exercise it through the smallDims=false seam directly.
    val docs = graft.Tables.documents(spark, sf)
    val p = TextAnalysis.bigramLogProbWithBf(
      TextAnalysis.bigramBf(docs, "doc_id", "text"),
      docs.select(org.apache.spark.sql.functions.explode(
          TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))
          .as("term"))
        .groupBy("term")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("uc")),
      smallDims = false).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      s"bigram/unigram totals must come from shuffle joins, not broadcasts:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window anywhere in the logprob plan:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the count joins must be skew-splittable shuffle joins:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"(doc, bigram) counts must partially aggregate map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row vocab size should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"1-row cross join must broadcast:\n$p")
    // and the registered (narrow-input) form keeps the invariants that
    // are scale-independent: no window, no cartesian
    val reg = plan("bigram_logprob")
    assert(!reg.contains("windowspecdefinition") &&
      !reg.contains("CartesianProduct"), s"registered form:\n$reg")
  }

  test("bigram_logprob_kn: one bigram-vocab shuffle feeds count/context/continuation tables") {
    // identical discipline to the add-one form: every open-vocabulary
    // side (bc, ctx, cont) joins by shuffle merge at CORPUS SCALE
    // (smallDims=false), only the 1-row type count broadcasts; the
    // registered narrow-input form may broadcast the dimension tables
    // (scale-guarded strategy, r18)
    val docs = graft.Tables.documents(spark, sf)
    val p = TextAnalysis.bigramLogProbKnWithBf(
      TextAnalysis.bigramBf(docs, "doc_id", "text"),
      smallDims = false).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      s"bigram/context/continuation tables must never broadcast:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"no window anywhere in the KN plan:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the count joins must be skew-splittable shuffle joins:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"(doc, bigram) counts must partially aggregate map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row bigram-type count should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"1-row cross join must broadcast:\n$p")
    val reg = plan("bigram_logprob_kn")
    assert(!reg.contains("windowspecdefinition") &&
      !reg.contains("CartesianProduct"), s"registered form:\n$reg")
  }

  test("bigram_rank_agreement: docs join midranks by broadcast; the only window is histogram-bounded") {
    val p = plan("bigram_rank_agreement")
    // the rank histogram (bounded by the 4-decimal score RANGE, not the
    // corpus) broadcasts back onto the doc scores; the cumulative-count
    // window runs over that same bounded histogram — the corpus itself
    // must never enter a window or a cartesian
    assert(p.contains("BroadcastHashJoin"),
      s"midranks must broadcast onto the per-doc scores:\n$p")
    assert(p.contains("windowspecdefinition"),
      s"the histogram cumulative rank is windowed by design:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("paragraph_dedup: keeper argmin via partial agg + merge join — no per-key window") {
    val p = plan("paragraph_dedup")
    assert(!p.contains("windowspecdefinition"),
      s"keep-first must be a partial-agg argmin, never a window:\n$p")
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"the (doc_id, par_idx) argmin must partially aggregate map-side:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the open unit-key domain joins by shuffle merge, never broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("paragraph_scrub_store: batch probes the persisted key table; store side is a bare scan") {
    val p = plan("paragraph_scrub_store")
    assert(p.contains("graft_par_store_"),
      s"the probe must scan the persisted (doc_id, par_key) segments:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the batch's bounded key set broadcasts against the store scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("source_kl: open vocab by merge join, per-source totals broadcast, no window") {
    val p = plan("source_kl")
    assert(p.contains("SortMergeJoin"),
      s"corpus word counts must join by shuffle merge:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the bounded per-source totals and the 1-row corpus total broadcast:\n$p")
    assert(!p.contains("windowspecdefinition"), s"no window:\n$p")
    assert(!p.contains("CartesianProduct"), s"1-row cross join must broadcast:\n$p")
  }

  test("ngram_novelty: docs-per-gram via partial agg + merge join, no window") {
    val p = plan("ngram_novelty")
    assert(p.contains("SortMergeJoin"),
      s"the open gram domain joins by shuffle merge:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"docs-per-gram must partially aggregate map-side:\n$p")
    assert(!p.contains("windowspecdefinition"), s"no window:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("doc_attributes: the whole signal bundle is one shuffle-free pruned scan") {
    val p = plan("doc_attributes")
    assert(!p.contains("Exchange"),
      s"an attributes export must never shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"unused doc columns must be pruned:\n$p")
    assert(p.contains("graft_rolling_fp") || p.contains("RollingFp"),
      s"the fingerprint must be the native expression:\n$p")
  }

  test("minhash md5-twin LSH pairs: bucket equi-join, never a cartesian pair join") {
    // the pair source feeding dedup_components_lsh and pipeline_curate
    // (the components queries themselves run a driver-side loop, so the
    // guard sits on the pair plan they consume)
    val p = graft.operators.Dedup
      .minhashLshMd5(Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH banding must make candidate generation an equi-join:\n$p")
  }

  test("multimodal_decode: encode->decode over a pruned scan, one fan-out exchange max") {
    // r17: the codec seam fans a narrow input out to cluster
    // parallelism (FanOut — pinned-count repartition so AQE cannot
    // fold it back to one partition); the ONLY allowed exchange is
    // that id-keyed fan-out, upstream of the encode. The decode itself
    // still never shuffles: bytes cross no exchange (the repartition
    // moves only doc_id longs).
    val p = plan("multimodal_decode")
    val exchanges = "(?<!Reused)Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"decode pipeline must shuffle at most the id fan-out:\n$p")
    assert(exchanges == 0 || p.contains("REPARTITION_BY_NUM"),
      s"the one exchange must be the pinned fan-out repartition:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan must read only doc_id (bytes are synthesized):\n$p")
  }

  test("per_source_cap: WindowGroupLimit pre-trims map-side (mega-source skew-safe)") {
    val p = plan("per_source_cap")
    // row_number() <= k must plan as WindowGroupLimit so each map task
    // ships at most k rows per source into the shuffle — without it a
    // mega-domain funnels its whole row set into one window task
    assert(p.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — per-group cap would straggle on big sources:\n$p")
  }

  test("doc_fingerprint: native rolling-fp projection, no higher-order lambda, no shuffle") {
    val p = plan("doc_fingerprint")
    assert(p.contains("graft_rolling_fp"), s"expected the native expression in:\n$p")
    assert(!p.contains("aggregate("), s"interpreted higher-order fold must be gone:\n$p")
    assert(!p.contains("Exchange"), s"fingerprints must not shuffle:\n$p")
  }

  test("dedup_substring_spans: membership semi-join, per-doc windows, native shingles") {
    val p = plan("dedup_substring_spans")
    // duplicate detection is a MEMBERSHIP test (semi join against the
    // partial-agg'd repeated-gram set) — linear on a hot gram and
    // AQE-splittable, unlike any pairing shape
    assert(p.contains("LeftSemi"),
      s"repeated-gram routing must be a semi join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"gram counts must partially aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span detection must never pair rows:\n$p")
    // the island merge must window per document, never globally — a
    // global window funnels the corpus into one task
    assert(p.contains("windowspecdefinition(doc_id#"),
      s"island merge must partition its window by doc:\n$p")
    // windows come from the native codegen'd expression, not the
    // interpreted transform/slice/array_join chain
    assert(p.contains("graft_shingles"),
      s"expected the native shingle expression:\n$p")
  }

  test("pack_sequences_bpe: native scan-side count, same one-exchange shape as the ws layout") {
    val p = plan("pack_sequences_bpe")
    // the BPE denomination must not change the pack plan: counting is a
    // scan-side native expression (no explode, no per-token rows, no
    // merge-table join — the table ships inside the expression), and
    // the only exchange is the shard window's
    assert(p.contains("graft_bpe_count"),
      s"expected the native BPE count expression:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 shard exchange, got $exchanges:\n$p")
    assert(!p.contains("Generate"), s"BPE counting must not explode rows:\n$p")
  }

  test("text_semantic_neardup(+ngram): bounded draw is a top-N heap, never a global sort") {
    // r17: the normalized-vector projection is lazily checkpointed
    // inside cosineNearDupPairs, so the draw's TakeOrdered no longer
    // appears in the FINAL plan — pin it on the shared draw's own
    // plan, and keep the no-global-sort guard on the final plans
    val dp = graft.packs.TextOps.textNearDupSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(dp.contains("TakeOrderedAndProject"),
      s"the fixed-N doc draw must plan as per-partition heaps:\n$dp")
    for (name <- Seq("text_semantic_neardup", "text_semantic_neardup_ngram")) {
      val p = plan(name)
      assert(!p.contains("Sort [") ||
        !p.contains("global=true"),
        s"$name: the draw must never globally sort the corpus:\n$p")
    }
  }

  test("url_canonicalize_psl: ~11 broadcast rule probes, zero corpus shuffles") {
    val p = plan("url_canonicalize_psl")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast rule probes:\n$p")
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("Exchange hashpartitioning"),
      s"PSL probing must never shuffle the corpus:\n$p")
  }

  test("text_neardup_incremental_store: zero chunk/hash/hyperplane work over the seen corpus") {
    val p = plan("text_neardup_incremental_store")
    // the seen side comes from the persisted parquet tables (zero
    // hyperplane/hash/norm recompute over the corpus); the BATCH's
    // bucket rows sit behind a lazy localCheckpoint (an RDD scan in
    // the plan), so the only embed/plane expressions visible are the
    // batch's verification projections — bounded and batch-sized
    val embeds = "graft_hash_embed".r.findAllIn(p).length
    val planes = "graft_hyperplane".r.findAllIn(p).length
    assert(p.contains("parquet"), s"seen side must scan the store:\n$p")
    assert(embeds <= 4 && planes <= 2,
      s"seen-side recompute leaking in ($embeds embeds, $planes plane passes):\n$p")
    assert(p.contains("graft_dot"),
      s"verification must run the native pre-normed cosine:\n$p")
  }

  test("classifier_score: shuffle-free one-pass native scan (the model rides along)") {
    val p = plan("classifier_score")
    assert(!p.contains("Exchange"), s"inference must not shuffle:\n$p")
    assert(p.contains("graft_nb_score_raw"),
      s"scoring must be the native expression:\n$p")
    assert(p.contains("*(1) Project"),
      s"the scoring projection must sit inside a whole-stage codegen span:\n$p")
  }

  test("classifier_score_bigram: shuffle-free one-pass native scan") {
    val p = plan("classifier_score_bigram")
    assert(!p.contains("Exchange"), s"bigram inference must not shuffle:\n$p")
    assert(p.contains("graft_nb_bigram_score_raw"),
      s"scoring must be the native unigram+bigram expression:\n$p")
  }

  test("classifier_eval/cutoff/eval_bigram: ONE shared checkpointed scan, no re-scoring") {
    // the curateAudit idiom at the eval seam: the (label, raw, raw_bi)
    // corpus scan — regex-heavy labeling plus BOTH inference passes —
    // runs once into a local checkpoint; every consumer's plan must
    // read that RDD, never the parquet, the quality regexes, or the
    // scoring expressions again
    Seq("classifier_eval", "classifier_eval_bigram",
        "classifier_cutoff").foreach { q =>
      val p = plan(q)
      assert(p.contains("ExistingRDD"),
        s"$q must consume the shared checkpoint:\n$p")
      assert(!p.contains("graft_nb_score_raw") &&
        !p.contains("graft_nb_bigram_score_raw"),
        s"$q must not re-run inference:\n$p")
      assert(!p.contains("regexp_"), s"$q must not re-run the label regexes:\n$p")
      assert(!p.contains("FileScan"), s"$q must not re-scan the corpus:\n$p")
    }
  }

  test("classifier_model: statistics reduce via partial agg before ONE exchange") {
    val p = plan("classifier_model")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"counts must combine map-side:\n$p")
    // token counts + doc counts: each branch one hash exchange on its
    // grouping key, nothing else — the corpus itself never shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <= 2 grouping exchanges, got $exchanges:\n$p")
  }

  test("gopher_rules / repeat_factor_sample / chunk_loss_mask: pure scan-side, no exchange") {
    Seq("gopher_rules", "repeat_factor_sample", "chunk_loss_mask").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
    }
  }

  test("repetition/dup_chars/entropy: one-pass native folds, zero exchanges") {
    // the r14 rewrite: doc-local statistics must never explode unit
    // rows into a shuffle — each family is one scan-side expression
    Seq(("text_repetition", "graft_rep_counts"),
        ("text_dup_chars", "graft_rep_mass"),
        ("text_entropy", "graft_entropy_stats")).foreach { case (q, fn) =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
      assert(p.contains(fn), s"$q must use the native fold $fn:\n$p")
      assert(!p.contains("Generate"), s"$q must not explode unit rows:\n$p")
    }
  }

  test("classifier_cutoff: argmax is top-1, window runs over the bounded histogram only") {
    val p = plan("classifier_cutoff")
    assert(p.contains("TakeOrderedAndProject"),
      s"the argmax must be top-1, never a global sort:\n$p")
    // corpus reduces to the clamped histogram before any window: the
    // quantize+label partial agg, the single-partition histogram
    // window, and the 1-row totals broadcast are the only exchanges
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges <= 4, s"expected bounded exchanges, got $exchanges:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial") ||
      p.contains("partial_sum"), s"histogram must combine map-side:\n$p")
  }

  test("decontaminate_spans(+store): bench membership is a semi-join, never a pair join") {
    Seq("decontaminate_spans", "decontaminate_spans_store").foreach { q =>
      val p = plan(q)
      assert(p.contains("LeftSemi"), s"$q bench probe must be LEFT SEMI:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must never pair docs against bench rows:\n$p")
      assert(p.contains("graft_shingles"),
        s"$q must window with the native shingle expression:\n$p")
    }
  }

  test("unigram_lm_encode_ids: one shuffle-free native-expression stage") {
    val p = plan("unigram_lm_encode_ids")
    assert(!p.contains("Exchange"),
      s"Viterbi encode must be scan-side, zero shuffles:\n$p")
    assert(p.contains("graft_unigram_ids"),
      s"encode must be the native codegen'd expression:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"unused doc columns must be pruned:\n$p")
  }

  test("wordpiece_encode_ids: one shuffle-free native-expression stage") {
    val p = plan("wordpiece_encode_ids")
    assert(!p.contains("Exchange"),
      s"greedy longest-match encode must be scan-side, zero shuffles:\n$p")
    assert(p.contains("graft_wordpiece_ids"),
      s"encode must be the native codegen'd expression:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"unused doc columns must be pruned:\n$p")
  }

  test("pack_ids_shuffled: permutation table derives from per-shard totals, never token rows") {
    val p = plan("pack_ids_shuffled")
    assert(!p.contains("posexplode") && !p.contains("graft_unigram_ids") &&
      !p.contains("graft_bpe_ids"),
      s"the shuffle must never materialize token rows:\n$p")
    assert(p.contains("partial_sum"),
      s"per-shard totals must combine map-side before the exchange:\n$p")
  }

  test("temperature_sample_tokens: bounded rate table broadcasts back onto the scan") {
    val p = plan("temperature_sample_tokens")
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast, never shuffle the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side shuffle join:\n$p")
  }

  test("pipeline_curate_multimodal: capped banding pairs, no cartesian, caption gate scan-side") {
    val p = plan("pipeline_curate_multimodal")
    assert(!p.contains("CartesianProduct"),
      s"image pairing must stay banded:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the bucket-cap / dup-id sides must broadcast:\n$p")
  }

  test("hybrid_search_rrf_store: serves from both stores — no re-tokenize, no re-embed") {
    val p = plan("hybrid_search_rrf_store")
    // the serving twin's reason to exist: tokenization is paid at
    // posting ingest and embedding at vector ingest — neither may
    // appear above the store scans. The corpus's only embed is the 5
    // query texts' (a literal local relation, not a scan consumer).
    assert(!p.contains("split("),
      s"the lexical side must probe persisted postings, never re-tokenize:\n$p")
    assert(p.contains("graft_lex_store_"),
      s"the lexical side must scan the posting segments:\n$p")
    assert(p.contains("graft_hybrid_emb_store_"),
      s"the dense side must scan the persisted pre-normed vectors:\n$p")
    // corpus-side doc vectors come from the store: the embed expression
    // may appear exactly once (the broadcast query-side literals)
    val embeds = "graft_hash_embed".r.findAllIn(p).size
    assert(embeds <= 1,
      s"doc vectors must not be re-embedded above the store scan ($embeds sites):\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("graft_topk"), s"fusion ranking stays the heap aggregate:\n$p")
  }

  test("hybrid_search_rrf_store_ivf: both sides index-pruned — no corpus assignment, no re-embed, no re-tokenize") {
    val p = plan("hybrid_search_rrf_store_ivf")
    // the serving form's reason to exist: the cell argmin is paid once
    // at ingest — the probe plan must never re-assign the corpus
    assert(!p.contains("graft_ivf_assign"),
      s"no assignment stage may run above the stored inverted file:\n$p")
    assert(p.contains("graft_hybrid_ivf_store_"),
      s"the dense side must scan the persisted inverted-file segments:\n$p")
    assert(p.contains("graft_lex_store_"),
      s"the lexical side must scan the posting segments:\n$p")
    assert(!p.contains("split("),
      s"the lexical side must probe persisted postings, never re-tokenize:\n$p")
    // doc vectors come from the store; the embed expression may appear
    // exactly once (the 5 broadcast query-side literals)
    val embeds = "graft_hash_embed".r.findAllIn(p).size
    assert(embeds <= 1,
      s"doc vectors must not be re-embedded above the store scan ($embeds sites):\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("graft_topk"),
      s"dense + fusion rankings stay heap aggregates:\n$p")
    // the probe side is a BROADCAST of |q|·nprobe cells onto the
    // bucketed file scan — the corpus side must never shuffle for it
    assert(p.contains("BroadcastHashJoin"),
      s"candidate cells must broadcast onto the inverted-file scan:\n$p")
  }

  test("hybrid_search_rrf_store_ivf_mmr: greedy tail over the IVF shortlist; pair sims from the inverted file's own vectors") {
    val p = plan("hybrid_search_rrf_store_ivf_mmr")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the greedy tail:\n$p")
    assert(!p.contains("Window"), s"argmax must stay a partial agg, never a window:\n$p")
    assert(!p.contains("graft_hash_embed"), s"no re-embed above the checkpoints:\n$p")
    assert(!p.contains("graft_ivf_assign"), s"no corpus re-assignment anywhere:\n$p")
    // the checkpoint-hidden pair-sim input, pinned at its own seam:
    // the MMR tail reads the inverted file's stored (emb, v_nrm) —
    // no second vector table, no recompute from text
    val normed = graft.packs.TextOps.hybridIvfStore(spark, sf).table(spark)
      .select("vec_id", "emb", "v_nrm")
    val np = normed.queryExecution.executedPlan.toString
    assert(np.contains("graft_hybrid_ivf_store_"),
      s"pair sims must read the persisted inverted-file segments:\n$np")
    assert(!np.contains("graft_hash_embed") && !np.contains("split("),
      s"stored vectors must not be recomputed from text:\n$np")
  }

  test("hybrid_search_rrf_store_mmr: greedy tail over checkpointed shortlists; pair sims from stored vectors") {
    // the greedy rounds read CHECKPOINTED shortlist-sized relations, so
    // the final plan is the MMR tail alone: every selection round must
    // be a partial-agg argmax (max(struct)), never a window, with no
    // cartesian and no embed anywhere above the checkpoints
    val p = plan("hybrid_search_rrf_store_mmr")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the greedy tail:\n$p")
    assert(!p.contains("Window"), s"argmax must stay a partial agg, never a window:\n$p")
    assert(!p.contains("graft_hash_embed"), s"no re-embed above the checkpoints:\n$p")
    // the greedy argmax idiom, pinned on the shared pick primitive
    // every round calls — the per-round checkpoints hide the rounds
    // themselves from the composed query's final plan string
    import org.apache.spark.sql.functions.col
    val scored = spark.range(4).select(
      (col("id") % 2).as("query_id"), col("id").as("vec_id"),
      col("id").cast("double").as("score"))
    val pick = graft.operators.SimilaritySearch.mmrPickBest(scored, 1)
      .queryExecution.executedPlan.toString
    assert(pick.contains("partial_max"),
      s"greedy argmax must combine map-side (max(struct) partial agg):\n$pick")
    assert(!pick.contains("Window"),
      s"greedy argmax must never be a window:\n$pick")
    // the checkpoint-hidden inputs, pinned at their own seams: the pair
    // similarities score the PERSISTED pre-normed vector table (zero
    // re-embed/re-norm), and the shortlist is the store-probing hybrid
    // plan already pinned above
    val normed = graft.packs.TextOps.hybridEmbStore(spark, sf)
      .vectorRows(spark).select("vec_id", "emb", "nrm")
    val np = normed.queryExecution.executedPlan.toString
    assert(np.contains("graft_hybrid_emb_store_"),
      s"pair sims must read the persisted vector segments:\n$np")
    assert(!np.contains("graft_hash_embed") && !np.contains("split("),
      s"stored vectors must not be recomputed from text:\n$np")
  }
}
