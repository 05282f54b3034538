package graft.operators

import java.util.Locale

/** The Mozilla Public Suffix List (publicsuffix.org) — the REAL ~9.5k
  * rule table behind registrable-domain (eTLD+1) reduction, bundled as
  * a resource snapshot (`public_suffix_list.dat`, the publicly
  * distributed data file; Debian ships the same snapshot under
  * /usr/share/publicsuffix) and parsed once per JVM.
  *
  * Rule grammar (publicsuffix.org/list format):
  *   - a line per rule; `//` comments and blank lines ignored; only
  *     the text up to the first whitespace is the rule
  *   - `foo.bar`   exact rule: "foo.bar" is a public suffix
  *   - `*.foo`     wildcard rule: EVERY single label under "foo" is a
  *     public suffix (we store the PARENT "foo"; a host tail of
  *     labelCount(parent)+1 labels whose tail-after-first-label equals
  *     the parent matches)
  *   - `!foo.bar`  exception rule: "foo.bar" is NOT a public suffix
  *     despite a covering wildcard — its PARENT is, so "foo.bar"
  *     itself is the registrable domain of any host under it
  *
  * Matching semantics ([[UrlOps.etld1Psl]]): the prevailing rule is
  * the exception if one matches, else the matching rule with the MOST
  * labels, else the implicit default rule `*` (the bare TLD) — and the
  * registrable domain is the prevailing suffix plus one more label.
  * IDN rules are kept verbatim (lowercased); ASCII hosts simply never
  * match them.
  */
object Psl {

  /** Parsed rule table, partitioned by kind. All rules lowercased. */
  final case class Rules(exact: IndexedSeq[String],
      wildcardParents: IndexedSeq[String], exceptions: IndexedSeq[String]) {

    private def depth(s: String): Int = s.count(_ == '.') + 1

    /** Label counts carrying exact rules (join/EXISTS depths). */
    def exactDepths: Seq[Int] = exact.map(depth).distinct.sorted
    /** Label counts at which a WILDCARD can match (parent depth + 1). */
    def wildcardDepths: Seq[Int] =
      wildcardParents.map(depth(_) + 1).distinct.sorted
    /** Label counts carrying exception rules. */
    def exceptionDepths: Seq[Int] = exceptions.map(depth).distinct.sorted
    /** Deepest possible suffix match (a registrable domain adds one). */
    def maxDepth: Int =
      (exactDepths ++ wildcardDepths ++ exceptionDepths).max
  }

  /** The bundled snapshot, parsed once per JVM. */
  lazy val rules: Rules = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null,
      "bundled public_suffix_list.dat missing from the classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  private[operators] def parse(lines: Iterator[String]): Rules = {
    val exact = Vector.newBuilder[String]
    val wild = Vector.newBuilder[String]
    val exc = Vector.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule =
          line.takeWhile(!_.isWhitespace).toLowerCase(Locale.ROOT)
        if (rule.startsWith("!")) exc += rule.drop(1)
        else if (rule.startsWith("*.")) wild += rule.drop(2)
        else if (rule != "*") exact += rule
      }
    }
    // IDN rules (≈466 unicode entries in the snapshot) additionally
    // get their PUNYCODE twin (RFC 3490 ToASCII via the JDK): real
    // crawl hosts carry IDN labels in xn-- form, and a unicode-only
    // rule would silently never match them. The unicode original stays
    // too (a host column that was never punycoded still matches);
    // rules the encoder rejects are kept as-is.
    def withPunycode(rules: Vector[String]): IndexedSeq[String] =
      rules.flatMap { r =>
        if (r.forall(_ < 128)) Seq(r)
        else
          try {
            val ascii = java.net.IDN.toASCII(r).toLowerCase(Locale.ROOT)
            if (ascii != r) Seq(r, ascii) else Seq(r)
          } catch { case _: IllegalArgumentException => Seq(r) }
      }.distinct
    val r = Rules(withPunycode(exact.result().distinct),
      withPunycode(wild.result().distinct),
      withPunycode(exc.result().distinct))
    require(r.exact.nonEmpty, "empty public suffix list")
    r
  }
}
