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
  * Deterministic steps, in order (each replicable in the DuckDB oracle
  * — both engines must implement the IDENTICAL algorithm, so every
  * character class below is spelled out in ASCII, never delegated to
  * locale- or Unicode-aware library predicates):
  *  1. trim the ASCII whitespace set ` \t\n\x0B\f\r`; drop the
  *     fragment (first '#' onward);
  *  2. parse `scheme://[userinfo@]host[:port]path[?query]` — anything
  *     that does not parse, or whose scheme is not http/https, returns
  *     the TRIMMED input unchanged (canonicalization never invents
  *     structure for opaque ids);
  *  3. scheme and host lowercase; trailing dots stripped from the host;
  *  4. the DEFAULT port drops (:80 for http, :443 for https — and a
  *     bare ':'); any other port stays; the port check accepts ASCII
  *     '0'-'9' ONLY (Unicode digits don't make a port);
  *  5. percent-escapes in path and query normalize per RFC 3986
  *     §6.2.2: an escape of an UNRESERVED byte (ALPHA / DIGIT / '-' /
  *     '.' / '_' / '~') DECODES (`%7E` → `~`, `%41` → `A` — encoding
  *     an unreserved char never changes meaning, so decoding it is
  *     always identity-safe), every other valid escape keeps its bytes
  *     but uppercases the hex (`%2f` → `%2F` — decoding a RESERVED
  *     char could change the URL's structure, so it never decodes); a
  *     '%' not followed by two hex digits is left alone;
  *  6. the path's trailing slashes strip; an empty path becomes '/';
  *  7. query parameters split on '&': empties drop, tracking params
  *     drop (lowercased name prefixed `utm_`/`mc_`, in
  *     [[CanonicalUrl.DropParams]], or in the CALLER-supplied extra
  *     drop set — ambiguous names like `ref`/`referrer`/`spm` that are
  *     meaningful on many sites are NOT dropped by default, they're
  *     opt-in via the extra set), survivors SORT lexicographically and
  *     rejoin — an empty survivor set drops the '?' entirely.
  *
  * Scale shape: per-row string algebra inside whole-stage codegen, no
  * shuffle, no UDF boxing — the canonical key feeds the ordinary
  * hash-groupBy dedup operators.
  */
case class CanonicalUrl(child: Expression, extraDrop: Seq[String] = Nil)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"canonical_url requires a string argument, got ${child.dataType.catalogString}")

  // the extra drop set rides generated code as one string literal, so
  // names are confined to literal-safe characters (param names in the
  // wild are exactly this alphabet)
  extraDrop.foreach(n => require(n.nonEmpty &&
    n.forall(c => c.isLetterOrDigit && c < 128 || c == '_' || c == '-' || c == '.'),
    s"extra drop-param names must be ASCII [A-Za-z0-9_.-]+: '$n'"))

  private val extraCsv = extraDrop.map(_.toLowerCase(java.util.Locale.ROOT))
    .distinct.sorted.mkString(",")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CanonicalUrl.canonicalize(input.asInstanceOf[UTF8String].toString, extraCsv))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CanonicalUrl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString($cls.canonicalize($c.toString(), "$extraCsv"))""")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
  override def prettyName: String = "canonical_url"
}

object CanonicalUrl {

  /** Tracking parameters dropped unconditionally by lowercased name
    * (plus any name prefixed `utm_` or `mc_`) — ONLY unambiguous
    * per-click analytics ids. Names some sites use meaningfully
    * (`ref`, `referrer`, `spm`) are deliberately NOT here: dropping
    * them would collapse genuinely distinct resources at the dedup
    * front gate; callers who know their corpus pass them via the
    * expression's extra drop set.
    */
  val DropParams: Set[String] = Set("gclid", "fbclid", "msclkid", "yclid", "igshid")

  private val UrlRe =
    java.util.regex.Pattern.compile(
      "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?$")

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  /** RFC 3986 §2.3 unreserved: ALPHA / DIGIT / '-' / '.' / '_' / '~'. */
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** §6.2.2 escape normalization in one left-to-right pass: a valid
    * %xx of an unreserved byte DECODES, any other valid %xx uppercases
    * its hex, a bare or malformed '%' is untouched. Decoded bytes are
    * never separators ('&', '=', '/', '%' are all reserved), so the
    * pass commutes with the later param split.
    */
  private[functions] def pctNorm(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) b.append(v.toChar)
        else b.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def dropTracking(name: String, extra: Set[String]): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || n.startsWith("mc_") ||
      DropParams.contains(n) || extra.contains(n)
  }

  // the EXPLICIT ASCII whitespace set — String.trim would also strip
  // every control char <= U+0020, which the oracle's chr-list trim
  // does not; both engines trim exactly these six
  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def asciiTrim(s: String): String = {
    var a = 0
    var z = s.length
    while (a < z && isAsciiWs(s.charAt(a))) a += 1
    while (z > a && isAsciiWs(s.charAt(z - 1))) z -= 1
    if (a == 0 && z == s.length) s else s.substring(a, z)
  }

  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  // the extra-drop set reaches generated code as ONE string literal
  // (a Set[String] can't ride a codegen'd call site), so the Set is
  // rebuilt from the CSV — memoized per distinct literal, because the
  // hook runs once per ROW inside whole-stage codegen and a per-row
  // split+toSet would be the only allocation in an otherwise
  // allocation-lean string pass. Bounded: keys are compile-time
  // expression literals (a handful per query plan), never data.
  private val extraSets =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  private def extraSet(csv: String): Set[String] = {
    val got = extraSets.get(csv)
    if (got != null) got
    else extraSets.computeIfAbsent(csv, c => c.split(',').toSet)
  }

  /** Public static hook used by both interpreted eval and generated
    * code. `extraDropCsv`: comma-joined lowercase extra drop-param
    * names ("" for none).
    */
  def canonicalize(raw: String, extraDropCsv: String = ""): String = {
    val extra: Set[String] =
      if (extraDropCsv.isEmpty) Set.empty
      else extraSet(extraDropCsv)
    val trimmed = asciiTrim(raw)
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
      if (colon >= 0 && hostPort.drop(colon + 1).forall(isAsciiDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    var host = rawHost.toLowerCase(java.util.Locale.ROOT)
    while (host.endsWith(".")) host = host.substring(0, host.length - 1)
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") && !(scheme == "https" && port == "443")
    var path = pctNorm(m.group(3))
    while (path.endsWith("/")) path = path.substring(0, path.length - 1)
    if (path.isEmpty) path = "/"
    val query = m.group(4)
    val keptParams: Seq[String] =
      if (query == null) Nil
      else pctNorm(query).split("&", -1).toSeq
        .filter(p => p.nonEmpty && !dropTracking(p.split("=", 2).head, extra))
        .sorted
    val b = new java.lang.StringBuilder(scheme)
    b.append("://").append(userinfo).append(host)
    if (keepPort) b.append(':').append(port)
    b.append(path)
    if (keptParams.nonEmpty) b.append('?').append(keptParams.mkString("&"))
    b.toString
  }

  def canonical_url(c: Column, extraDrop: Set[String] = Set.empty): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CanonicalUrl(ColumnBridge.expression(c), extraDrop.toSeq.sorted))
  }
}
