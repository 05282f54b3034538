package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Gopher document-quality rules ([[TextAnalysis.gopherRules]]):
  * a corpus of planted documents trips each published rule exactly —
  * including the line-level rules the synthetic corpus can never
  * exercise — and a clean document passes all seven. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // 60 mid-length words incl. several stop-octet members: passes all
  private val clean = (Seq("the", "be", "of", "and") ++
    (1 to 56).map(i => s"word$i")).mkString(" ")

  private val corpus = Seq(
    1L -> clean,
    2L -> "too short to pass the word count rule honestly",
    // 60 single-char words: mean word length 1 < 3
    3L -> (Seq("the", "of") ++ Seq.fill(58)("a")).mkString(" "),
    // 60 twelve-char words: mean word length 12 > 10
    4L -> (Seq("the", "be") ++
      Seq.fill(58)("abcdefghijkl")).mkString(" "),
    // 10 '#' among 70 words: symbol ratio 10/70 > 0.1
    5L -> (clean + " " + Seq.fill(10)("#").mkString(" ")),
    // 11 lines, 10 bulleted: 10/11 ≈ 0.909 > 0.9 (the paper removes
    // at MORE THAN 90%; exactly 90% is kept — doc 11 below)
    6L -> ((1 to 10).map(i => s"- ${clean}")
      :+ clean).mkString("\n"),
    // 10 lines, 4 ending in ellipsis: 0.4 > 0.3
    7L -> ((1 to 4).map(_ => s"$clean ...")
      ++ (1 to 6).map(_ => clean)).mkString("\n"),
    // 13 numeric among 60 words: alpha fraction 47/60 < 0.8
    8L -> (Seq("the", "of") ++ (1 to 13).map(_.toString) ++
      (1 to 45).map(i => s"word$i")).mkString(" "),
    // only ONE stop-octet member present
    9L -> (Seq("the") ++ (1 to 59).map(i => s"word$i")).mkString(" "),
    // EXACTLY 90% bulleted / 30% ellipsis lines: the paper's "more
    // than" keeps the boundary document
    11L -> ((1 to 9).map(_ => s"- $clean") ++ Seq(clean)).mkString("\n"),
    12L -> ((1 to 3).map(_ => s"$clean ...")
      ++ (1 to 7).map(_ => clean)).mkString("\n"),
    // 5 '#' AND 5 '...' in 70 words: EACH ratio is 0.071 <= 0.1, so
    // the paper's "either" test keeps it — a summed-symbols variant
    // would see 10/70 > 0.1 and wrongly reject
    13L -> (Seq.fill(5)("...").mkString(" ") + " " +
      Seq.fill(5)("#").mkString(" ") + " " + clean)
  ).toDF("doc_id", "text")

  private lazy val out = TextAnalysis
    .gopherRules(corpus, "doc_id", "text")
    .collect().map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8))).toMap

  test("a clean document passes all seven rules") {
    assert(out(1L) == ((true, true, true, true, true, true, true, true)))
  }

  test("each planted violation trips exactly its rule") {
    // (wc, mwl, symbol, bullet, ellipsis, alpha, stop, keep)
    assert(!out(2L)._1 && !out(2L)._8, "word count")
    assert(out(3L)._1 && !out(3L)._2 && !out(3L)._8, "mean word len low")
    assert(out(4L)._1 && !out(4L)._2 && !out(4L)._8, "mean word len high")
    assert(out(5L)._1 && !out(5L)._3 && !out(5L)._8, "symbol ratio")
    assert(out(6L)._1 && !out(6L)._4 && !out(6L)._8, "bullet lines")
    assert(out(7L)._1 && !out(7L)._5 && !out(7L)._8, "ellipsis lines")
    assert(out(8L)._1 && !out(8L)._6 && !out(8L)._8, "alpha words")
    assert(out(9L)._1 && !out(9L)._7 && !out(9L)._8, "stop octet")
    // the violations are surgical: every OTHER rule still passes
    assert(out(2L)._7 && out(2L)._6, "short doc violates only wc")
    assert(out(5L)._2 && out(5L)._7, "symbol doc violates only symbols")
    assert(out(6L)._2 && out(6L)._5 && out(6L)._7)
    assert(out(7L)._4 && out(7L)._7)
  }

  test("boundary documents at exactly 90% / 30% are kept (MORE THAN removes)") {
    assert(out(11L)._4 && out(11L)._8, "9 of 10 bulleted lines is kept")
    assert(out(12L)._5 && out(12L)._8, "3 of 10 ellipsis lines is kept")
  }

  test("symbol rule tests EACH symbol's ratio independently, per the paper") {
    assert(out(13L)._3 && out(13L)._8,
      "0.071 hash + 0.071 ellipsis must pass the per-symbol 0.1 test")
  }

  test("stop-word count is distinct presence, not occurrences") {
    // 'the' repeated 5 times is still ONE distinct stop word
    val rep = Seq(10L -> (Seq.fill(5)("the") ++
      (1 to 55).map(i => s"w$i")).mkString(" ")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(rep, "doc_id", "text")
      .select("stop_ok").as[Boolean].head()
    assert(!r)
  }

  test("per-language stop table: a German doc the English octet fails FLIPS") {
    // a perfectly ordinary German document: 60 words including the
    // common function words 'der', 'und', 'die', 'ist' — under the
    // paper's English octet it has ZERO stop hits and is silently
    // rejected; under the language-keyed table it passes
    val german = (Seq("der", "und", "die", "ist") ++
      (1 to 56).map(i => s"wort$i")).mkString(" ")
    val docs = Seq(
      (1L, "de", german),
      (2L, "en", clean),
      // unknown language falls back to the English octet (documented)
      (3L, "xx", clean)
    ).toDF("doc_id", "lang", "text")
    val faithful = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "stop_ok", "keep").as[(Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val byLang = TextAnalysis.gopherRulesByLang(docs, "doc_id", "text", "lang")
      .select("doc_id", "stop_ok", "keep").as[(Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(faithful(1L) == ((false, false)),
      "the English octet must silently fail the German doc")
    assert(byLang(1L) == ((true, true)),
      "the German stop table must flip it to kept")
    // English and unknown-language docs behave identically in both forms
    assert(byLang(2L) == faithful(2L) && byLang(2L) == ((true, true)))
    assert(byLang(3L) == faithful(3L))
  }

  test("by-lang variant only changes the stop rule: other six rules byte-identical") {
    val docs = corpus.withColumn("lang", lit("de"))
    val a = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "wc_ok", "mwl_ok", "symbol_ok", "bullet_ok",
        "ellipsis_ok", "alpha_ok").collect().map(r => r.getLong(0) -> r.toSeq.tail)
    val b = TextAnalysis.gopherRulesByLang(docs, "doc_id", "text", "lang")
      .select("doc_id", "wc_ok", "mwl_ok", "symbol_ok", "bullet_ok",
        "ellipsis_ok", "alpha_ok").collect().map(r => r.getLong(0) -> r.toSeq.tail)
    assert(a.toMap == b.toMap)
  }
}
