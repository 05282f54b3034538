package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Full Public Suffix List semantics ([[Psl]] + [[UrlOps.etld1Psl]]):
  * the bundled ~9.5k-rule Mozilla snapshot with WILDCARD (*.ck) and
  * EXCEPTION (!www.ck) rules — the algorithm branches the bounded
  * CASE-chain table cannot express. */
class PslSpec extends SparkSpec {
  import spark.implicits._

  test("bundled snapshot parses: kinds partitioned, known rules present") {
    val r = Psl.rules
    assert(r.exact.size > 9000, s"expected ~9.5k exact rules, got ${r.exact.size}")
    assert(r.wildcardParents.size > 50 && r.exceptions.size >= 8)
    assert(r.exact.contains("com") && r.exact.contains("co.uk") &&
      r.exact.contains("github.io"))
    assert(r.wildcardParents.contains("ck") &&
      r.wildcardParents.contains("kawasaki.jp"))
    assert(r.exceptions.contains("www.ck") &&
      r.exceptions.contains("city.kawasaki.jp"))
    assert(!r.exact.exists(s => s.startsWith("!") || s.startsWith("*")),
      "kind markers must be stripped")
    assert(r.maxDepth == 5, s"snapshot's deepest rule: ${r.maxDepth}")
    // the 5-label exact rule the depth machinery must reach
    assert(r.exact.contains("s3.dualstack.ap-northeast-1.amazonaws.com"))
    // IDN rules carry their punycode twin (crawl hosts are xn-- form)
    assert(r.exact.contains("公司.cn") &&
      r.exact.contains(java.net.IDN.toASCII("公司.cn")),
      "unicode rules must gain RFC 3490 ASCII twins")
  }

  test("punycoded crawl hosts match IDN rules") {
    val cnCompany = java.net.IDN.toASCII("公司.cn") // xn--55qx5d.cn
    val got = psl(s"example.$cnCompany", s"sub.example.$cnCompany",
      "example.公司.cn")
    assert(got(s"example.$cnCompany") == s"example.$cnCompany",
      "suffix 公司.cn in xn-- form + one label")
    assert(got(s"sub.example.$cnCompany") == s"example.$cnCompany")
    assert(got("example.公司.cn") == "example.公司.cn",
      "the unicode original still matches un-punycoded hosts")
  }

  private def psl(hosts: String*): Map[String, String] = {
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
    UrlOps.etld1Psl(df, "host").select("host", "etld1")
      .as[(String, String)].collect().toMap
  }

  test("wildcard rules: every label under *.ck is a public suffix") {
    val got = psl("foo.bar.ck", "x.foo.bar.ck", "b.ck", "ck",
      "a.other.kawasaki.jp", "other.kawasaki.jp")
    assert(got("foo.bar.ck") == "foo.bar.ck",
      "suffix bar.ck + one label")
    assert(got("x.foo.bar.ck") == "foo.bar.ck",
      "wildcard matches exactly parent+1 labels — deeper tails don't")
    assert(got("b.ck") == "b.ck", "a host that IS a suffix passes through")
    assert(got("ck") == "ck", "* does not match the bare parent")
    assert(got("a.other.kawasaki.jp") == "a.other.kawasaki.jp")
    assert(got("other.kawasaki.jp") == "other.kawasaki.jp")
  }

  test("exception rules: !www.ck prevails over *.ck") {
    val got = psl("www.ck", "sub.www.ck", "deep.sub.www.ck",
      "city.kawasaki.jp", "x.city.kawasaki.jp")
    assert(got("www.ck") == "www.ck")
    assert(got("sub.www.ck") == "www.ck",
      "exception's parent is the suffix, the exception is registrable")
    assert(got("deep.sub.www.ck") == "www.ck")
    assert(got("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(got("x.city.kawasaki.jp") == "city.kawasaki.jp")
  }

  test("exact rules at every depth, implicit-* fallback, degenerates") {
    val got = psl("www.example.com", "a.b.example.co.uk",
      "b.s3.dualstack.ap-northeast-1.amazonaws.com",
      "x.b.s3.dualstack.ap-northeast-1.amazonaws.com",
      "foo.github.io", "x.foo.github.io",
      "example.zzinvalid", "a.example.zzinvalid", "localhost",
      "jp", "x..co.uk", "a..b", "")
    assert(got("www.example.com") == "example.com")
    assert(got("a.b.example.co.uk") == "example.co.uk")
    assert(got("b.s3.dualstack.ap-northeast-1.amazonaws.com") ==
      "b.s3.dualstack.ap-northeast-1.amazonaws.com",
      "the snapshot's deepest (5-label) exact rule")
    assert(got("x.b.s3.dualstack.ap-northeast-1.amazonaws.com") ==
      "b.s3.dualstack.ap-northeast-1.amazonaws.com")
    assert(got("foo.github.io") == "foo.github.io",
      "private-section rules count")
    assert(got("x.foo.github.io") == "foo.github.io")
    assert(got("example.zzinvalid") == "example.zzinvalid",
      "unlisted TLD: implicit * rule, last two labels")
    assert(got("a.example.zzinvalid") == "example.zzinvalid")
    assert(got("localhost") == "localhost")
    assert(got("jp") == "jp", "bare exact suffix passes through")
    assert(got("x..co.uk") == "x..co.uk",
      "empty label before the suffix passes through (etld1 convention)")
    assert(got("a..b") == "a..b")
    assert(got("") == "")
  }

  test("full-PSL path agrees with the bounded fold on its own table's domain") {
    // every suffix in the bounded table is a real PSL rule, so on hosts
    // that only touch those rules the two paths must agree
    val hosts = Seq(
      "www.example.com", "a.b.example.co.uk", "deep.sub.project.github.io",
      "example.uk", "x.example.io", "co.uk", "com", "localhost",
      "a.b.example.zz", "intranet", "", ".co.uk", "x..co.uk",
      "api.example.com.au", "files.example.de", "blog.blogspot.com",
      "x.herokuapp.com", "only.uk", "a.gov.uk")
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
    val fold = df.select(col("id"), UrlOps.etld1(col("host")).as("e"))
      .as[(Long, String)].collect().toMap
    val full = UrlOps.etld1Psl(df, "host").select(col("id"), col("etld1"))
      .as[(Long, String)].collect().toMap
    hosts.zipWithIndex.foreach { case (h, i) =>
      assert(full(i.toLong) == fold(i.toLong),
        s"host '$h': PSL '${full(i.toLong)}' != fold '${fold(i.toLong)}'")
    }
  }

  test("PSL probing is broadcast-only: no corpus shuffle, no sort-merge join") {
    val df = (1L to 100L).map(i => (i, s"a$i.example.foo.ck"))
      .toDF("id", "host")
    val plan = UrlOps.etld1Psl(df, "host")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("Exchange hashpartitioning"),
      s"rule probing must never shuffle the corpus:\n$plan")
  }
}
