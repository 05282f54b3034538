package graft.operators

import graft.SparkSpec

/** The broadcast-dictionary phrase tagger — the generalized C4
  * banned-words scan: multiword matching, overlapping-occurrence
  * counting, short/empty-doc safety, C4 page semantics, and the plan
  * shape (dictionary broadcast, corpus never in a cartesian). */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val phrases =
    Seq("slow", "big query", "table table table", "never present")

  private def docs = Seq(
    (1L, "a big query ran slow on the big query path"), // 2× "big query", 1× "slow"
    (2L, "table table table table"), // 2 OVERLAPPING trigram positions
    (3L, "clean document with none of the listed phrases"),
    (4L, "big"), // shorter than the 2-gram — no match, no gram
    (5L, ""), // empty text: single empty token, no match
    (6L, "slow") // exactly one token, matches the 1-word phrase
  ).toDF("doc_id", "text")

  test("phrase hits: multiword + overlapping occurrences, exact counts") {
    val got = Blocklist.phraseHits(docs, "doc_id", "text", phrases)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "big query", 2L),
      (1L, "slow", 1L),
      (2L, "table table table", 2L),
      (6L, "slow", 1L)), s"got $got")
  }

  test("tag verdict: every doc emits, sorted CSV, C4 keep semantics") {
    val got = Blocklist.tagVerdict(docs, "doc_id", "text", phrases)
      .as[(Long, String, Long, Boolean)].collect().toMap3
    assert(got(1L) == ("big query,slow", 3L, false))
    assert(got(2L) == ("table table table", 2L, false))
    assert(got(3L) == ("", 0L, true))
    assert(got(4L) == ("", 0L, true))
    assert(got(5L) == ("", 0L, true))
    assert(got(6L) == ("slow", 1L, false))
  }

  private implicit class Tup4Ops(rows: Array[(Long, String, Long, Boolean)]) {
    def toMap3: Map[Long, (String, Long, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("plan: dictionary broadcasts; no cartesian; ONE corpus scan for all lengths") {
    val p = Blocklist.phraseHits(docs, "doc_id", "text", phrases)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the dictionary side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no unkeyed join may appear:\n$p")
    // the fixture has 3 distinct phrase lengths; a per-length union
    // would scan the corpus 3 times — the fused projection scans once
    // (2 local scans total: the corpus + the broadcast dictionary)
    val scans = "LocalTableScan".r.findAllIn(p).size
    assert(scans <= 2,
      s"corpus must be scanned ONCE for all phrase lengths, saw $scans scans:\n$p")
  }

  test("case folding: C4's case-insensitive rule by default; exact-case as the option") {
    // the planted mixed-case page the exact-case join MISSES: C4's
    // published rule lowercases the page before matching the list
    val mixed = Seq(
      (10L, "a Big Query ran SLOW today"),
      (11L, "BIG QUERY"),
      (12L, "all lowercase big query here")).toDF("doc_id", "text")
    val folded = Blocklist.phraseHits(mixed, "doc_id", "text",
        Seq("big query", "slow")).as[(Long, String, Long)].collect().toSet
    assert(folded == Set(
      (10L, "big query", 1L), (10L, "slow", 1L),
      (11L, "big query", 1L), (12L, "big query", 1L)), s"got $folded")
    // a mixed-case DICTIONARY normalizes too (reported term is the
    // lowercased canonical form)
    val dictCase = Blocklist.phraseHits(mixed, "doc_id", "text",
        Seq("Big Query")).as[(Long, String, Long)].collect().toSet
    assert(dictCase == Set((10L, "big query", 1L), (11L, "big query", 1L),
      (12L, "big query", 1L)), s"got $dictCase")
    // foldCase = false: the old exact-case join — the planted pages
    // pass the gate, only the literal-lowercase doc matches
    val exact = Blocklist.phraseHits(mixed, "doc_id", "text",
        Seq("big query", "slow"), foldCase = false)
      .as[(Long, String, Long)].collect().toSet
    assert(exact == Set((12L, "big query", 1L)), s"got $exact")
    val verdict = Blocklist.tagVerdict(mixed, "doc_id", "text",
        Seq("big query"), foldCase = false)
      .as[(Long, String, Long, Boolean)].collect().toMap3
    assert(verdict(10L) == ("", 0L, true) &&
      verdict(11L) == ("", 0L, true) &&
      verdict(12L) == ("big query", 1L, false))
  }

  test("non-long doc ids fail loudly (no silent cast to NULL keys)") {
    val strIds = Seq(("a", "big query here")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Blocklist.phraseHits(strIds, "doc_id", "text", phrases)
    }
    assert(e1.getMessage.contains("LONG doc ids"))
    val e2 = intercept[IllegalArgumentException] {
      Blocklist.tagVerdict(strIds, "doc_id", "text", phrases)
    }
    assert(e2.getMessage.contains("LONG doc ids"))
  }

  test("generated-SQL dict rows: shared escaping seam refuses quotes/backslashes") {
    assert(Blocklist.sqlDictRows(Seq("big query"))
      == "(lower('big query'), 2)")
    assert(Blocklist.sqlDictRows(Seq("Big Query"), foldCase = false)
      == "('Big Query', 2)")
    intercept[IllegalArgumentException] {
      Blocklist.sqlDictRows(Seq("o'brien list"))
    }
    intercept[IllegalArgumentException] {
      Blocklist.sqlDictRows(Seq("back\\slash"))
    }
  }

  test("malformed phrases fail loudly") {
    intercept[IllegalArgumentException] {
      Blocklist.phraseHits(docs, "doc_id", "text", Seq(" padded "))
    }
    intercept[IllegalArgumentException] {
      Blocklist.phraseHits(docs, "doc_id", "text", Seq("double  space"))
    }
    intercept[IllegalArgumentException] {
      Blocklist.phraseHits(docs, "doc_id", "text", Seq.empty)
    }
  }

  test("null text contributes no grams and keeps") {
    val withNull = Seq((7L, null.asInstanceOf[String]), (8L, "slow ride"))
      .toDF("doc_id", "text")
    val got = Blocklist.tagVerdict(withNull, "doc_id", "text", phrases)
      .as[(Long, String, Long, Boolean)].collect().toMap3
    assert(got(7L) == ("", 0L, true))
    assert(got(8L) == ("slow", 1L, false))
  }
}
