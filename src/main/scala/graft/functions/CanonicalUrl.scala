package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as a native codegen'd expression — the keyed
  * identity web-corpus dedup groups on: the same resource fetched as
  * `HTTP://Host.ES:80/Docs/?b=2&utm_source=x&a=1#frag` and
  * `http://host.es/Docs?a=1&b=2` must produce ONE canonical key.
  * Extends the reference's URL cleanup (ntp_entry.py:137-141 — strip
  * whitespace/backslash garbage before fetching) from "fetchable" to
  * "identity-comparable", the standard canonicalization of web-scale
  * dedup (RFC 3986 §6 syntax-based normalization plus the tracking-param
  * strip every crawl pipeline applies).
  *
  * Deterministic steps, in order (each replicable in the DuckDB oracle):
  *  1. trim ASCII whitespace; drop the fragment (first '#' onward);
  *  2. parse `scheme://[userinfo@]host[:port]path[?query]` — anything
  *     that does not parse, or whose scheme is not http/https, returns
  *     the TRIMMED input unchanged (canonicalization never invents
  *     structure for opaque ids);
  *  3. scheme and host lowercase; trailing dots stripped from the host;
  *  4. the DEFAULT port drops (:80 for http, :443 for https — and a
  *     bare ':'); any other port stays;
  *  5. percent-escapes in path and query get UPPERCASE hex (%2f → %2F;
  *     a '%' not followed by two hex digits is left alone — never
  *     decoded, so reserved-character semantics cannot change);
  *  6. the path's trailing slashes strip; an empty path becomes '/';
  *  7. query parameters split on '&': empties drop, tracking params
  *     drop (lowercased name in [[CanonicalUrl.DropParams]] or prefixed
  *     `utm_`), survivors SORT lexicographically and rejoin — an empty
  *     survivor set drops the '?' entirely.
  *
  * Scale shape: per-row string algebra inside whole-stage codegen, no
  * shuffle, no UDF boxing — the canonical key feeds the ordinary
  * hash-groupBy dedup operators.
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"canonical_url requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CanonicalUrl.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CanonicalUrl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($cls.canonicalize($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
  override def prettyName: String = "canonical_url"
}

object CanonicalUrl {

  /** Tracking parameters dropped by lowercased name (plus any name
    * prefixed `utm_`) — the cross-site analytics tags that vary per
    * click without changing the resource.
    */
  val DropParams: Set[String] = Set(
    "gclid", "fbclid", "msclkid", "yclid", "igshid", "spm",
    "ref", "referrer", "mc_cid", "mc_eid")

  private val UrlRe =
    java.util.regex.Pattern.compile(
      "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?$")

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Uppercase the hex digits of every valid %xx escape; leave a bare
    * or malformed '%' untouched.
    */
  private[functions] def pctUpper(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val b = new java.lang.StringBuilder(s)
    while (i >= 0 && i + 2 < s.length) {
      if (isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        b.setCharAt(i + 1, Character.toUpperCase(s.charAt(i + 1)))
        b.setCharAt(i + 2, Character.toUpperCase(s.charAt(i + 2)))
      }
      i = s.indexOf('%', i + 1)
    }
    b.toString
  }

  private def dropTracking(name: String): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || DropParams.contains(n)
  }

  /** Public static hook used by both interpreted eval and generated code. */
  def canonicalize(raw: String): String = {
    val trimmed = raw.trim
    val hash = trimmed.indexOf('#')
    val noFrag = if (hash >= 0) trimmed.substring(0, hash) else trimmed
    val m = UrlRe.matcher(noFrag)
    if (!m.matches()) return trimmed
    val scheme = m.group(1).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return trimmed
    val authority = m.group(2)
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    val colon = hostPort.lastIndexOf(':')
    val (rawHost, port) =
      if (colon >= 0 && hostPort.drop(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    var host = rawHost.toLowerCase(java.util.Locale.ROOT)
    while (host.endsWith(".")) host = host.substring(0, host.length - 1)
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") && !(scheme == "https" && port == "443")
    var path = pctUpper(m.group(3))
    while (path.endsWith("/")) path = path.substring(0, path.length - 1)
    if (path.isEmpty) path = "/"
    val query = m.group(4)
    val keptParams: Seq[String] =
      if (query == null) Nil
      else pctUpper(query).split("&", -1).toSeq
        .filter(p => p.nonEmpty && !dropTracking(p.split("=", 2).head))
        .sorted
    val b = new java.lang.StringBuilder(scheme)
    b.append("://").append(userinfo).append(host)
    if (keepPort) b.append(':').append(port)
    b.append(path)
    if (keptParams.nonEmpty) b.append('?').append(keptParams.mkString("&"))
    b.toString
  }

  def canonical_url(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CanonicalUrl(ColumnBridge.expression(c)))
  }
}
