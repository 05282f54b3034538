package graft

/** Every registered query must run and produce rows at sf0.001, and every
  * oracle key must point at a registered query. The value-level check is
  * the driver's DuckDB compare (tools/check_oracle.py); this guards
  * plan-breaking regressions in CI. */
class QueryPackSpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every gated query is oracle-backed (zero rows-only gates)") {
    // the Verify set is 100% DuckDB-verified; anything oracle-less
    // belongs in a pack's benchOnly map, not in queries. The
    // trained-snapshot oracles (IVF / NB / BPE families) are GENERATED
    // once their models exist — Verify's dump order guarantees that;
    // here, CONSTRUCTING the straggler queries triggers trainCached
    // (training runs at DataFrame-construction time), after which the
    // oracle map must be total
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    missing.foreach(n => SparkEntry.queries(n)(spark, sf))
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak.isEmpty, s"gated queries without an oracle: $weak")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("store and SQL-surface twins share their oracle strings verbatim") {
    // a twin re-expresses WHERE the data comes from (a store) or HOW
    // the plan is declared (SQL text) — never WHAT is computed, so its
    // oracle must be the SAME string object-for-object; a forked copy
    // could drift silently on the next edit
    val o = SparkEntry.oracleSql
    assert(o("percentiles_store") == o("percentiles"))
    assert(o("hybrid_search_rrf_store") == o("hybrid_search_rrf"))
    assert(o("sql_hybrid_search_rrf") == o("hybrid_search_rrf"))
    assert(o("sql_percentiles_approx") == o("percentiles_approx"))
    assert(o("sql_bm25_search") == o("bm25_search"))
    assert(o("term_freq_topk_store") == o("term_freq_topk"))
    assert(o("drift_vs_corpus_store") == o("drift_vs_corpus"))
    assert(o("sql_drift_vs_corpus") == o("drift_vs_corpus"))
    assert(o("sql_blocklist_tag") == o("blocklist_tag"))
    assert(o("sql_drift_by_source") == o("drift_by_source"))
  }

  // Queries whose gate output is LEGITIMATELY empty on the synthetic
  // corpus: redact_spans reports PII token islands and the corpus
  // carries no PII-shaped content at all (no digits, no '@') — zero
  // spans IS the correct answer, value-pinned by the oracle's
  // identical empty result. The plan must still execute cleanly.
  private val emptyOk = Set("redact_spans")

  // benchQueries ⊇ queries: the bench-only twins must run too
  SparkEntry.benchQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    if (emptyOk(name))
      test(s"query $name runs on sf0.001 (empty gate output by design)") {
        assert(fn(spark, sf).count() == 0,
          s"$name is expected empty on the PII-free corpus; " +
            "if PII was added to testdata, move it out of emptyOk")
      }
    else
      test(s"query $name runs on sf0.001 with rows > 0") {
        val df = fn(spark, sf)
        assert(df.count() > 0)
      }
  }
}
