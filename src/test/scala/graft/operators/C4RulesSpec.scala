package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C4 line rules on planted punctuated fixtures — the gate corpus has
  * no punctuation, so every keep path is exercised here (the Gopher
  * fixture pattern). Units are structural lines ([[Paragraphs
  * .unitsByDelimiter]] — the production unit the rules were published
  * for). */
class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  private def filter(rows: Seq[(Long, String)]) = {
    val d = rows.toDF("doc_id", "text")
    C4Rules.c4LineFilter(d, "doc_id", "text",
      Paragraphs.unitsByDelimiter(d, "doc_id", "text"), sep = "\n")
  }

  test("line rules: terminal punctuation, min words, javascript") {
    val text = Seq(
      "This line ends with a period.",        // keep
      "Does this line survive the filter?",   // keep (question mark)
      "No terminal punctuation here",         // drop: punct
      "Too short.",                           // drop: words (2 < 3)
      "Please enable Javascript to continue.",// drop: js (case-insens.)
      "She said \"hello there.\""             // keep (end quote)
    ).mkString("\n")
    val out = filter(Seq((1L, text)))
      .select("clean_text", "n_kept", "n_drop_punct", "n_drop_words",
        "n_drop_js", "doc_keep")
      .as[(String, Long, Long, Long, Long, Boolean)].head()
    assert(out._1 == Seq("This line ends with a period.",
      "Does this line survive the filter?",
      "She said \"hello there.\"").mkString("\n"))
    assert(out._2 == 3, s"3 keepers expected: $out")
    assert(out._3 == 1 && out._4 == 1 && out._5 == 1,
      s"independent per-rule counts: $out")
    // 3 kept < MinKeptLines 5 → the page itself is dropped
    assert(!out._6)
  }

  test("per-rule counts are independent: one line can fail several rules") {
    // "Javascript required" fails punct AND js AND words(=2)
    val out = filter(Seq((1L, "Javascript required")))
      .select("n_drop_punct", "n_drop_words", "n_drop_js")
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 1L, 1L)), s"each rule counts its own failure: $out")
  }

  test("page rules: lorem ipsum, curly brace, min kept lines") {
    val five = (1 to 5).map(i => s"Good sentence number $i stands here.")
    val out = filter(Seq(
      (1L, five.mkString("\n")),                            // keeps
      (2L, (five :+ "Lorem Ipsum dolor sit amet.").mkString("\n")),
      (3L, (five :+ "A brace { appears in this line.").mkString("\n")),
      (4L, five.take(4).mkString("\n"))))                   // < 5 kept
      .select("doc_id", "has_lorem", "has_brace", "n_kept", "doc_keep")
      .as[(Long, Boolean, Boolean, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._5, s"clean five-line page keeps: ${out(1L)}")
    assert(out(2L)._2 && !out(2L)._5, "lorem ipsum drops the page")
    assert(out(3L)._3 && !out(3L)._5, "curly brace drops the page")
    assert(!out(4L)._5 && out(4L)._4 == 4, "four kept lines < 5 drops")
  }

  test("gate window-unit form: corpus fails punct wholesale, counts carry signal") {
    val docs = graft.Tables.documents(spark, sf)
    val out = C4Rules.c4LineFilterByWindow(docs, "doc_id", "text")
    val agg = out.agg(sum("n_kept"), sum("n_drop_punct"),
        sum("n_drop_words"), max(length(col("clean_text"))))
      .as[(Long, Long, Long, Int)].head()
    assert(agg._1 == 0L, "no punctuation in the corpus → zero keeps")
    assert(agg._2 > 0L, "every unit fails the terminal-punct rule")
    assert(agg._4 == 0, "cleaned text empty everywhere at the gate")
  }
}
