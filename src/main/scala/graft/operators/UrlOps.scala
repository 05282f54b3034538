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

  /** Registrable domain under the FULL Public Suffix List
    * ([[Psl.rules]] — the bundled ~9.5k-rule Mozilla snapshot),
    * wildcard and exception rules included: the production form of
    * [[etld1ViaTable]]'s broadcast seam.
    *
    * Algorithm (publicsuffix.org): among matching rules the EXCEPTION
    * prevails outright (its parent is the suffix, so the exception
    * rule itself is the registrable tail); else the DEEPEST match —
    * exact rules by tail equality at each label depth, wildcard rules
    * where the tail one label shorter equals the stored parent and the
    * consumed label is non-empty; else the implicit `*` default — the
    * last two labels, via the same `([^.]+\.[^.]+)$` fallback every
    * other path uses. Registrable = suffix + one non-empty label; a
    * host that IS a suffix (or with a degenerate empty label) passes
    * through, matching [[etld1]]'s conventions.
    *
    * Scale shape: per depth one LEFT BROADCAST-HASH join of a
    * scan-side `substring_index` tail against the rule table — ~11
    * tiny broadcast probes total (exact depths 1..5, wildcard 2..5,
    * exception 2..3 in the current snapshot), zero corpus shuffles,
    * zero explodes; the prevailing-rule fold is one codegen'd CASE
    * cascade. The DuckDB twin ([[etld1PslOracleSql]]) is generated
    * from the SAME parsed rules. */
  def etld1Psl(docs: DataFrame, hostCol: String,
      rules: Psl.Rules = Psl.rules): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val h = col(hostCol)
    val labels = split(h, "\\.")
    val n = size(labels)
    def tail(i: Int): Column =
      when(n >= i, substring_index(h, ".", -i))
    // i-th label from the right (1-based), null when absent — only
    // ever read under an n-depth guard on both engines
    def lbl(i: Int): Column = try_element_at(labels, n - lit(i) + lit(1))

    val exactDf = broadcast(rules.exact.toDF("__psl_sfx"))
    val wildDf = broadcast(rules.wildcardParents.toDF("__psl_wp"))
    val excDf = broadcast(rules.exceptions.toDF("__psl_xc"))

    var joined = docs
    for (i <- rules.exactDepths)
      joined = joined.join(
        exactDf.select(col("__psl_sfx").as(s"__psl_e$i")),
        tail(i) === col(s"__psl_e$i"), "left")
    for (i <- rules.wildcardDepths)
      joined = joined.join(
        wildDf.select(col("__psl_wp").as(s"__psl_w$i")),
        tail(i - 1) === col(s"__psl_w$i"), "left")
    for (i <- rules.exceptionDepths)
      joined = joined.join(
        excDf.select(col("__psl_xc").as(s"__psl_x$i")),
        tail(i) === col(s"__psl_x$i"), "left")

    def matched(i: Int): Column = {
      val ex =
        if (rules.exactDepths.contains(i)) col(s"__psl_e$i").isNotNull
        else lit(false)
      val wl =
        if (rules.wildcardDepths.contains(i))
          col(s"__psl_w$i").isNotNull && n >= i &&
            coalesce(lbl(i), lit("")) =!= ""
        else lit(false)
      ex || wl
    }
    def regFor(i: Int): Column =
      when(n > i && coalesce(lbl(i + 1), lit("")) =!= "",
        substring_index(h, ".", -(i + 1))).otherwise(h)
    val noMatch = coalesce(
      nullif(regexp_extract(h, "([^.]+\\.[^.]+)$", 1), lit("")), h)

    // ascending fold: each depth wraps the previous as its otherwise,
    // so the DEEPEST match is tested first; exceptions wrap outermost
    var res: Column = noMatch
    for (i <- 1 to rules.maxDepth) res = when(matched(i), regFor(i))
      .otherwise(res)
    for (i <- rules.exceptionDepths)
      res = when(col(s"__psl_x$i").isNotNull, tail(i)).otherwise(res)

    val dropCols =
      rules.exactDepths.map(i => s"__psl_e$i") ++
        rules.wildcardDepths.map(i => s"__psl_w$i") ++
        rules.exceptionDepths.map(i => s"__psl_x$i")
    joined.withColumn("etld1", res).drop(dropCols: _*)
  }

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The DuckDB twin of [[etld1Psl]], generated from the SAME parsed
    * rule table (one source of truth, zero drift): the full rule set
    * is embedded as a VALUES list (kind 0 exact / 1 wildcard parent /
    * 2 exception — the trained-artifact-in-SQL pattern), tails come
    * from list_slice over string_split, matches are EXISTS probes, and
    * the prevailing-rule CASE mirrors the engine's fold order exactly
    * (exceptions deepest-first, then match depths descending, then the
    * shared regex fallback). `fromRelation` must expose
    * (doc_id, url, host). */
  def etld1PslOracleSql(fromRelation: String,
      rules: Psl.Rules = Psl.rules): String = {
    val values = (rules.exact.map(_ -> 0) ++
        rules.wildcardParents.map(_ -> 1) ++
        rules.exceptions.map(_ -> 2))
      .map { case (r, k) => s"(${sqlQuote(r)}, $k)" }
      .grouped(8).map(_.mkString(", ")).mkString(",\n    ")
    val d = rules.maxDepth
    def t(i: Int) =
      s"CASE WHEN n >= $i THEN array_to_string(list_slice(ls, n - $i + 1, n), '.') END"
    val tails = (1 to (d + 1)).map(i => s"    ${t(i)} AS t$i").mkString(",\n")
    def exists(kind: Int, tcol: String) =
      s"EXISTS(SELECT 1 FROM psl_rules r WHERE r.kind = $kind AND r.rule = $tcol)"
    val excCases = rules.exceptionDepths.reverse.map(i =>
      s"    WHEN ${exists(2, s"t$i")} THEN t$i").mkString("\n")
    val matchCases = (1 to d).reverse.map { i =>
      val ex =
        if (rules.exactDepths.contains(i)) Some(exists(0, s"t$i")) else None
      val wl =
        if (rules.wildcardDepths.contains(i))
          Some(s"(n >= $i AND coalesce(ls[n - $i + 1], '') <> '' AND " +
            exists(1, s"t${i - 1}") + ")")
        else None
      val cond = (ex ++ wl).mkString(" OR ")
      s"""    WHEN $cond THEN
         |      CASE WHEN n > $i AND coalesce(ls[n - $i], '') <> ''
         |        THEN t${i + 1} ELSE host END""".stripMargin
    }.mkString("\n")
    s"""WITH psl_rules(rule, kind) AS (VALUES
       |    $values
       |), hx AS (
       |  SELECT doc_id, url, host, string_split(host, '.') AS ls,
       |         len(string_split(host, '.')) AS n
       |  FROM $fromRelation
       |), tl AS (
       |  SELECT doc_id, url, host, ls, n,
       |$tails
       |  FROM hx
       |)
       |SELECT doc_id, url, host,
       |  CASE
       |$excCases
       |$matchCases
       |    ELSE coalesce(nullif(regexp_extract(host, '([^.]+\\.[^.]+)${"$"}', 1), ''), host)
       |  END AS etld1
       |FROM tl""".stripMargin
  }
}
