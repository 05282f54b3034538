package graft

/** Whole-stage codegen must COMPILE for every native-expression hot
  * path — a silent interpreted fallback (as round 1's DotProduct
  * nullable bug caused in ann_ivf) is a correctness-of-performance
  * regression. `spark.sql.codegen.fallback=false` turns any generated-
  * code compile failure into a thrown exception, so these executions
  * prove zero `ERROR CodeGenerator` fallbacks. */
class CodegenStrictSpec extends SparkSpec {

  private val hotQueries = Seq(
    "ann_ivf", "ann_ivf_store", "ann_ivfpq", "ann_ivfpq_store",
    "ann_ivfpq_refine", "ann_ivfpq_res", "ann_hamming",
    "ann_lsh", "ann_brute", "ann_topk_agg",
    "semantic_neardup", "semantic_neardup_incremental_store",
    "embedding_neardup_lsh", "embedding_neardup_incremental",
    "embedding_neardup_incremental_store",
    "dedup_minhash", "dedup_simhash",
    "dedup_minhash_xxh64", "dedup_simhash_xxh64",
    "dedup_incremental_simhash", "dedup_incremental_minhash_store",
    "dedup_incremental_simhash_store",
    "unigram_logprob", "bigram_logprob", "pipeline_curate_quality",
    "dsir_select", "dsir_select_store", "pipeline_curate_dsir",
    "text_dup_chars", "ann_recall", "ann_recall_pq", "prune_prototypes",
    "prune_prototypes_store", "sql_dsir_select", "text_entropy",
    "multimodal_phash_dedup", "multimodal_audio_dedup", "dedup_soft_weights",
    "ann_hard_negatives", "quality_floor_by_lang", "dedup_rate_by_source",
    "neardup_rate_by_source", "pipeline_curate_bylang",
    "sql_quality_floor_by_lang",
    "token_count_bpe", "pack_sequences_bpe", "token_budget_sample_bpe",
    "url_canonicalize", "per_domain_cap", "token_count_bpe_store",
    "vocab_top_subwords", "truncate_tokens_bpe", "chunk_documents",
    "avro_roundtrip", "embed_text_components", "chunk_embed_ann",
    "text_semantic_neardup", "text_semantic_neardup_lsh",
    "classifier_model", "classifier_score", "classifier_filter",
    "classifier_score_store", "pipeline_curate_classifier",
    "gopher_rules", "repeat_factor_sample", "chunk_loss_mask",
    "bpe_fertility", "multimodal_resize", "classifier_eval", "classifier_cutoff",
    "bpe_encode_ids", "bpe_encode_ids_bytes", "gopher_rules_by_lang",
    "classifier_score_bigram", "classifier_eval_bigram",
    "pack_ids_incremental_store",
    "unigram_lm_encode_ids", "unigram_lm_score", "unigram_lm_floor",
    "pack_ids_unigram", "token_budget_sample_unigram",
    "truncate_tokens_unigram",
    "wordpiece_encode_ids", "wordpiece_encode_ids_store",
    "wordpiece_fertility_vs_bpe",
    "bigram_logprob_kn", "bigram_rank_agreement",
    "paragraph_dedup", "paragraph_scrub", "paragraph_scrub_store",
    "source_kl", "ngram_novelty",
    "pipeline_curate_lm", "pipeline_curate_scrubbed",
    "pipeline_curate_ccnet", "pack_stats_padded",
    "dedup_threshold_curve", "classifier_rank_agreement",
    "mixture_rates_target", "dedup_cluster_stats", "lang_mixed", "doc_attributes", "gopher_verdict", "gopher_verdict_by_lang",
    "paragraph_rate_by_source")

  private def strict[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  hotQueries.foreach { name =>
    test(s"$name executes with codegen fallback disabled") {
      strict {
        // benchQueries ⊇ queries: includes the bench-only xxh64 twins
        val df = SparkEntry.benchQueries(name)(spark, sf)
        // noop write, not count(): count() collapses to a zero-column
        // aggregate and ColumnPruning REMOVES every top-level
        // projection — a projection-only query (gopher_rules,
        // chunk_loss_mask, …) would pass this gate without its rule
        // expressions ever compiling (the repo's recorded bench
        // gotcha, applied to the strict gate)
        df.write.format("noop").mode("overwrite").save()
        assert(df.count() > 0)
      }
    }
  }
}
