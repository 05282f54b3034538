package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain canonicalization — the normalization in front of every
  * per-source operator ([[TextAnalysis.perSourceCap]],
  * `dedup_rate_by_source`, per-domain mixture control): raw crawl URLs
  * for one site differ by scheme, subdomain, port, path, query and
  * case, so source-keyed caps and audits over raw URLs silently split
  * a domain into many keys. Canonical key = the REGISTRABLE domain
  * (eTLD+1): one label plus the longest matching public suffix
  * ("a.b.example.co.uk" → "example.co.uk").
  *
  * Scale shape: everything is a scan-side string expression — host
  * extraction is one RE2-compatible regex (identical in the DuckDB
  * oracle), and the longest-suffix-first match folds the BOUNDED
  * suffix table into a codegen'd CASE chain, so the corpus is never
  * joined or shuffled for canonicalization. The table here is a
  * representative subset; the full Mozilla Public Suffix List (~9k
  * rules, public domain) plugs into the SAME seam — at that size the
  * fold becomes a broadcast join on the host's candidate suffixes
  * (explode the ≤ 4 label-tails, LEFT JOIN the broadcast list, keep
  * the longest hit), still zero corpus shuffles. Wildcard/exception
  * PSL rules (`*.ck`, `!www.ck`) live at that seam too.
  */
object UrlOps {

  /** Bounded public-suffix table (subset; see scaladoc for the full-PSL
    * seam). Multi-label suffixes MUST outrank their tails — ordering is
    * by label count, then length ([[orderedSuffixes]]). */
  val PublicSuffixes: Seq[String] = Seq(
    "com", "org", "net", "io", "edu", "gov", "info", "dev", "app",
    "de", "fr", "es", "it", "nl", "jp", "cn", "uk", "au", "br", "in",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "co.in", "co.kr",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com")

  /** Longest-match-first evaluation order: more labels beat fewer
    * ("co.uk" before "uk"), longer beats shorter within a label count.
    * Deterministic final tie-break by the string itself. */
  def orderedSuffixes: Seq[String] =
    PublicSuffixes.sortBy(s => (-s.count(_ == '.'), -s.length, s))

  /** RE2-compatible (no lookaround — the DuckDB oracle runs the SAME
    * pattern): scheme, optional userinfo, capture host, stop at
    * port/path/query/fragment. */
  val HostPattern = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

  /** Lowercased host of a URL; empty string when the URL has no
    * scheme+authority shape (the regexp_extract no-match convention,
    * identical in DuckDB). */
  def host(url: Column): Column = lower(regexp_extract(url, HostPattern, 1))

  private def escapeDots(s: String): String = s.replace(".", "\\.")

  /** Registrable domain (eTLD+1) of a lowercased host: one label plus
    * the longest matching public suffix. A host that IS a public
    * suffix, or where the label before the suffix is empty, passes
    * through unchanged; a host matching no suffix falls back to its
    * last two labels (single-label hosts pass through). */
  def etld1(host: Column): Column = {
    val fallback = coalesce(
      nullif(regexp_extract(host, "([^.]+\\.[^.]+)$", 1), lit("")), host)
    orderedSuffixes.foldRight(fallback) { case (s, acc) =>
      when(host === s, host)
        .when(host.endsWith("." + s),
          coalesce(nullif(
            regexp_extract(host, "([^.]+\\." + escapeDots(s) + ")$", 1),
            lit("")), host))
        .otherwise(acc)
    }
  }

  /** Canonicalize a URL column: (… , host, etld1) appended. */
  def urlCanonicalize(docs: DataFrame, idCol: String,
      urlCol: String): DataFrame = {
    val h = host(col(urlCol))
    docs.select(col(idCol), col(urlCol),
      h.as("host"), etld1(h).as("etld1"))
  }

  /** [[etld1]] over a suffix RELATION instead of the compiled-in list —
    * the full-PSL seam AS CODE: a ~9k-rule table cannot become a CASE
    * chain, so each of the host's last-1..maxLabels label tails
    * (`substring_index(host, ".", -i)` — a scan-side expression, no
    * explode) probes the BROADCAST suffix table through one left
    * broadcast-hash join per label depth, and `coalesce` from the
    * deepest tail down picks the longest match — exactly the fold's
    * (label count desc) priority (two suffixes can't tie at one depth:
    * a tail is a single string and the table is distinct). Zero
    * shuffles, zero aggregations: the corpus flows through maxLabels
    * broadcast joins and a scan-side projection. Pass-through rules
    * (bare-suffix host, no-match fallback to the last two labels,
    * degenerate empty label before the suffix) mirror [[etld1]] —
    * `UrlOpsSpec` pins the two paths equal on the bounded list.
    * Wildcard/exception PSL rules (`*.ck`, `!www.ck`) would add one
    * more depth-(n+1) probe and an exception pre-check here. */
  def etld1ViaTable(docs: DataFrame, hostCol: String, suffixes: DataFrame,
      maxLabels: Int = 4): DataFrame = {
    require(maxLabels >= 1, s"maxLabels must be >= 1, got $maxLabels")
    val h = col(hostCol)
    val joined = (1 to maxLabels).foldLeft(docs) { (acc, i) =>
      acc.join(
        broadcast(suffixes.select(col("suffix").as(s"__sfx$i"))),
        substring_index(h, ".", -i) === col(s"__sfx$i"), "left")
    }
    val best = coalesce((maxLabels to 1 by -1).map(i => col(s"__sfx$i")): _*)
    // strip ".suffix", take the last remaining label; an empty label
    // (host ".co.uk" or "x..co.uk") passes the host through, matching
    // the fold's [^.]+ requirement
    val prefix = substring(h, lit(1), length(h) - length(best) - 1)
    val lastLabel = substring_index(prefix, ".", -1)
    // no-match fallback: the fold's EXACT regex, not substring_index —
    // the -2 tail of a host with an empty label ("a..b" → ".b") is not
    // a registrable domain, and the fold's ([^.]+\.[^.]+)$ rejects it
    // (passes the host through); the two paths must agree on every
    // degenerate host (ADVICE r10)
    val noMatch = coalesce(
      nullif(regexp_extract(h, "([^.]+\\.[^.]+)$", 1), lit("")), h)
    joined.withColumn("etld1",
        when(best.isNull, noMatch)
          .when(best === h, h)
          .when(lastLabel === "", h)
          .otherwise(concat(lastLabel, lit("."), best)))
      .drop((1 to maxLabels).map(i => s"__sfx$i"): _*)
  }

  /** The DuckDB twin of [[etld1]], generated from the SAME ordered
    * suffix table (one source of truth, zero drift) over a lowercased
    * host SQL expression. */
  def etld1Sql(hostSql: String): String = {
    val cases = orderedSuffixes.map { s =>
      val px = escapeDots(s)
      s"""WHEN $hostSql = '$s' THEN $hostSql
         |    WHEN $hostSql LIKE '%.$s' THEN coalesce(nullif(regexp_extract($hostSql, '([^.]+\\.$px)${"$"}', 1), ''), $hostSql)""".stripMargin
    }.mkString("\n    ")
    s"""CASE $cases
       |    ELSE coalesce(nullif(regexp_extract($hostSql, '([^.]+\\.[^.]+)${"$"}', 1), ''), $hostSql) END""".stripMargin
  }

  /** The DuckDB twin of [[host]]. */
  def hostSql(urlSql: String): String =
    s"lower(regexp_extract($urlSql, '$HostPattern', 1))"
}
