package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Host extraction + eTLD+1 reduction edge cases — the longest-match
  * ordering and pass-through rules the CASE-chain fold must honor. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: (Long, String)*): Map[Long, (String, String)] =
    UrlOps.urlCanonicalize(urls.toSeq.toDF("id", "url"), "id", "url")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

  test("host extraction strips scheme, userinfo, port, path, query, case") {
    val got = canon(
      1L -> "https://WWW.Example.COM/a/b?q=1",
      2L -> "http://user:pw@api.example.co.uk:8443/x",
      3L -> "ftp://files.example.de",
      4L -> "not a url at all")
    assert(got(1L) == (("www.example.com", "example.com")))
    assert(got(2L) == (("api.example.co.uk", "example.co.uk")))
    assert(got(3L) == (("files.example.de", "example.de")))
    assert(got(4L) == (("", "")), "non-URL input yields empty host/etld1")
  }

  test("longest suffix wins: co.uk beats uk, github.io beats io") {
    val got = canon(
      1L -> "https://a.b.example.co.uk/",
      2L -> "https://deep.sub.project.github.io",
      3L -> "https://plain.example.uk",
      4L -> "https://x.example.io")
    assert(got(1L)._2 == "example.co.uk")
    assert(got(2L)._2 == "project.github.io")
    assert(got(3L)._2 == "example.uk")
    assert(got(4L)._2 == "example.io")
  }

  test("pass-through rules: bare suffix, single label, unknown TLD fallback") {
    val got = canon(
      1L -> "https://co.uk/path",         // host IS a public suffix
      2L -> "https://localhost:9000/",    // single label, no suffix match
      3L -> "https://a.b.example.zz",     // unknown TLD → last two labels
      4L -> "https://intranet")
    assert(got(1L)._2 == "co.uk")
    assert(got(2L)._2 == "localhost")
    assert(got(3L)._2 == "example.zz")
    assert(got(4L)._2 == "intranet")
  }

  test("broadcast-join path (full-PSL seam) ≡ CASE fold on every host shape") {
    // every structural case: subdomain chains, multi-label suffixes,
    // bare suffixes, unknown TLDs, single labels, empty/degenerate
    // labels, case already lowered by host()
    val hosts = Seq(
      "www.example.com", "a.b.example.co.uk", "deep.sub.project.github.io",
      "example.uk", "x.example.io", "co.uk", "com", "localhost",
      "a.b.example.zz", "intranet", "", ".co.uk", "x..co.uk",
      // no-match FALLBACK degenerates (ADVICE r10): empty labels in the
      // last-two-label tail must pass the host through on BOTH paths
      "a..b", "a.b.", "..", ".zz", "x..zz",
      "api.example.com.au", "files.example.de", "blog.blogspot.com",
      "x.herokuapp.com", "only.uk", "a.gov.uk").zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val df = hosts.toDF("id", "host")
    val viaFold = df.select(col("id"), UrlOps.etld1(col("host")).as("e"))
      .as[(Long, String)].collect().toMap
    val sfx = UrlOps.PublicSuffixes.toDF("suffix")
    val viaJoin = UrlOps.etld1ViaTable(df, "host", sfx)
      .select(col("id"), col("etld1"))
      .as[(Long, String)].collect().toMap
    hosts.foreach { case (i, h) =>
      assert(viaJoin(i) == viaFold(i),
        s"host '$h': join path '${viaJoin(i)}' != fold path '${viaFold(i)}'")
    }
    // and the join path is broadcast-only: no shuffle over the corpus
    val plan = UrlOps.etld1ViaTable(df, "host", sfx)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("Exchange hashpartitioning"),
      s"suffix probing must never shuffle the corpus:\n$plan")
  }

  test("suffix ordering is longest-first regardless of declaration order") {
    val o = UrlOps.orderedSuffixes
    assert(o.indexOf("co.uk") < o.indexOf("uk"))
    assert(o.indexOf("github.io") < o.indexOf("io"))
    assert(o.indexOf("blogspot.com") < o.indexOf("com"))
  }
}
