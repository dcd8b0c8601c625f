package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[UrlCanon]] — one static call per row inside
  * whole-stage codegen (the [[HtmlExtractUtil]] pattern). Implements the
  * standard crawl-pipeline URL canonicalization (the C4 corpus dedups by
  * URL as its FIRST stage — Raffel et al. JMLR'20 §2.2; the rules below
  * are RFC 3986 §6 syntax-based normalization plus the universal
  * tracking-parameter strip):
  *
  *  1. scheme and host lowercase (RFC 3986 §6.2.2.1 case normalization;
  *     userinfo, path and query stay case-SENSITIVE per the RFC);
  *  2. default-port strip — `:80` for http, `:443` for https
  *     (§6.2.3 scheme-based normalization);
  *  3. fragment drop — fragments are client-side only, two URLs that
  *     differ in fragment fetch the same resource;
  *  4. tracking-parameter strip — keys `utm_*` (case-insensitive),
  *     `fbclid`, `gclid`, `msclkid`: advertising click ids that vary
  *     per impression and would defeat URL-level dedup;
  *  5. query-parameter sort — remaining `k=v` pairs sort
  *     lexicographically (bytewise on the full pair), so semantically
  *     equal URLs with reordered parameters collide; empty params
  *     (`a&&b`) drop. A query left empty loses its `?`;
  *  6. percent-encoding normalization, the SAFE subset only
  *     (§6.2.2.1-2): decode `%XX` exactly when XX encodes an
  *     UNRESERVED character (ALPHA / DIGIT / `-` `.` `_` `~`) — the
  *     decode the RFC declares lossless for every component — and
  *     uppercase the hex digits of every escape that survives
  *     (`%2f` → `%2F`). Malformed escapes (truncated, non-hex) pass
  *     through untouched. Applied to userinfo, host (before the case
  *     fold, so decoded ALPHA still lowercases), path, and each query
  *     parameter (before the tracking check, so `%75tm_source` can't
  *     smuggle a tracking key past the strip). Splitting happens on
  *     the RAW text first: `%26`/`%3F`/`%23` are reserved and stay
  *     encoded, so decoding can never introduce new delimiters.
  *
  * Everything else passes through verbatim: path (trailing-slash and
  * dot-segment semantics are site-specific, so collapsing them risks
  * false merges), userinfo, non-default ports. Deliberately NOT done:
  * decoding RESERVED percent-escapes (`%2F` in a path is NOT `/` —
  * RFC 3986 §2.2 — decoding it merges distinct resources) and
  * IDN/punycode folding — both can over-merge, and a dedup key must
  * never over-merge; they belong in a site-policy layer above this
  * syntax-based pass. A string with no `://`, or one whose scheme
  * candidate violates the RFC's `ALPHA *(ALPHA / DIGIT / + / - / .)`
  * grammar (e.g. `://` embedded in a non-URL prefix), is not a
  * hierarchical URL — returned unchanged. */
object UrlCanonUtil {

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** RFC 3986 §3.1: scheme = ALPHA *(ALPHA / DIGIT / "+" / "-" / "."). */
  private def isScheme(s: String): Boolean = {
    if (s.isEmpty || !isAlpha(s.charAt(0))) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (!isAlpha(c) && !isDigit(c) && c != '+' && c != '-' && c != '.')
        return false
      i += 1
    }
    true
  }

  private def hexVal(c: Char): Int =
    if (isDigit(c)) c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** RFC 3986 §2.3 unreserved: ALPHA / DIGIT / "-" / "." / "_" / "~". */
  private def isUnreserved(v: Int): Boolean =
    (v >= 'a' && v <= 'z') || (v >= 'A' && v <= 'Z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** §6.2.2.1-2 percent normalization (see the object scaladoc rule 6):
    * decode unreserved escapes, uppercase the hex of surviving ones,
    * pass malformed sequences through verbatim. */
  private def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = (if (eq >= 0) param.substring(0, eq) else param)
      .toLowerCase(java.util.Locale.ROOT)
    key.startsWith("utm_") || key == "fbclid" || key == "gclid" ||
      key == "msclkid"
  }

  def canonicalize(url: UTF8String): UTF8String = {
    val s = url.toString
    val sep = s.indexOf("://")
    if (sep < 0) return url // not hierarchical: pass through
    val schemeRaw = s.substring(0, sep)
    if (!isScheme(schemeRaw)) return url // '://' in a non-URL prefix
    val scheme = schemeRaw.toLowerCase(java.util.Locale.ROOT)
    val afterScheme = sep + 3
    // authority ends at the first '/', '?' or '#'
    var aEnd = afterScheme
    while (aEnd < s.length && s.charAt(aEnd) != '/' &&
      s.charAt(aEnd) != '?' && s.charAt(aEnd) != '#') aEnd += 1
    val authority = s.substring(afterScheme, aEnd)
    // userinfo (before the last '@') passes through; host lowercases
    val at = authority.lastIndexOf('@')
    val userinfo =
      if (at >= 0) pctNormalize(authority.substring(0, at + 1)) else ""
    val hostPort = authority.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    // a ':' only counts as a port separator when it sits after any ']'
    // (bracketed IPv6 literals keep their internal colons) and only
    // ASCII digits follow it (Char.isDigit would accept every Unicode
    // decimal-digit class — not a port)
    val hasPort = colon >= 0 && colon > hostPort.indexOf(']') &&
      colon < hostPort.length - 1 &&
      hostPort.substring(colon + 1).forall(isDigit)
    // decode BEFORE the case fold so an escape-decoded ALPHA lowercases
    // (the other order would break idempotence)
    val host = pctNormalize(
      if (hasPort) hostPort.substring(0, colon) else hostPort)
      .toLowerCase(java.util.Locale.ROOT)
    val port = if (hasPort) hostPort.substring(colon + 1) else ""
    val keepPort = hasPort &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    // path up to '?' or '#'; query up to '#'; fragment dropped
    var pEnd = aEnd
    while (pEnd < s.length && s.charAt(pEnd) != '?' &&
      s.charAt(pEnd) != '#') pEnd += 1
    val path = pctNormalize(s.substring(aEnd, pEnd))
    val query =
      if (pEnd < s.length && s.charAt(pEnd) == '?') {
        var qEnd = pEnd + 1
        while (qEnd < s.length && s.charAt(qEnd) != '#') qEnd += 1
        s.substring(pEnd + 1, qEnd)
      } else ""
    // split on the RAW query ('%26' is reserved — decoding introduces
    // no new '&'), normalize each param, THEN filter and sort
    val kept = query.split("&", -1)
      .map(pctNormalize)
      .filter(p => p.nonEmpty && !isTracking(p))
      .sorted(Ordering.String) // bytewise pair sort: stable collisions
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(userinfo).append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (kept.nonEmpty) {
      sb.append('?')
      var i = 0
      while (i < kept.length) {
        if (i > 0) sb.append('&')
        sb.append(kept(i))
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd URL canonicalization — `url_canonicalize(url) -> string`.
  * See [[UrlCanonUtil]] for the exact rules. A native expression rather
  * than a regex chain so the whole normalization is one codegen'd pass
  * on the scan path (the html_extract precedent), and so the parse is a
  * real parser (authority/port/query structure), not pattern guesses.
  * Registered as SQL `url_canonicalize` via [[graft.GraftExtensions]]. */
case class UrlCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(url: Any): Any =
    UrlCanonUtil.canonicalize(url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UrlCanonUtil.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanon =
    copy(child = newChild)
}

object UrlExpressions {
  val urlCanonDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("url_canonicalize"),
    new ExpressionInfo(classOf[UrlCanon].getName, "url_canonicalize"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"url_canonicalize(url) requires exactly 1 argument, got ${children.length}")
      UrlCanon(children.head)
    })
}
