package graft.harvest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F15/F16 crawl-metadata sniffing as pure Column algebra — codegen'd,
  * per-row, shuffle-free, oracle-testable offline.
  *
  * Re-expresses the reference's header/HTML inspection
  * (nextplib/ntp_utils.py:195-215 `get_file_type`, :169-183
  * `check_meta_refresh`) with identical string semantics, minus the
  * BeautifulSoup dependency: the meta-refresh tag is matched by regex on
  * the first KB of content (refresh tags live in <head>), which keeps it
  * a scan-bound Column expression instead of a per-row HTML parse.
  */
object UrlSniff {

  val DocxMime = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"

  /** F15a: document type from the Content-Type header value alone
    * (reference: ntp_utils.py:199-206 — only these three map; everything
    * else stays '').
    */
  def typeFromContentType(ct: Column): Column =
    when(ct === "application/pdf", lit("pdf"))
      .when(ct.startsWith("text/html"), lit("html"))
      .when(ct === DocxMime, lit("docx"))
      .otherwise(lit(""))

  /** The last `filename`-bearing item of a Content-Disposition value,
    * after the reference's entity-garbage cleanup (ntp_utils.py:208-210:
    * '769;' / '8230;' are mojibake HTML entities seen in the wild).
    * Null when no item mentions a filename.
    */
  private def filenameItem(cd: Column): Column =
    // try_: a Content-Disposition with no filename item yields an empty
    // array, and ANSI element_at would abort the whole fetch batch on it
    try_element_at(
      filter(split(replace(replace(cd, lit("769;"), lit("_")), lit("8230;"), lit("_")), ";"),
        x => x.contains("filename")), lit(-1))

  /** F15b: extension extracted from the Content-Disposition filename
    * (ntp_utils.py:210-214): text after the first '=', ' .' glitch fixed,
    * lowercased; extension = after the last dot, with '?=' and '"'
    * residue stripped. Null when the header has no filename item.
    */
  def typeFromDisposition(cd: Column): Column = {
    val item = filenameItem(cd)
    val afterEq = item.substr(instr(item, "=") + 1, length(item))
    val fname = lower(replace(afterEq, lit(" ."), lit(".")))
    val ext = regexp_extract(fname, "\\.([^.]*)$", 1)
    when(item.isNull, lit(null).cast("string"))
      .otherwise(replace(replace(ext, lit("?="), lit("")), lit("\""), lit("")))
  }

  /** F15: combined header sniff — a Content-Disposition filename wins
    * over the Content-Type mapping (the reference processes disposition
    * last and overwrites).
    */
  def fileTypeFromHeaders(contentType: Column, contentDisposition: Column): Column =
    coalesce(typeFromDisposition(contentDisposition),
      typeFromContentType(coalesce(contentType, lit(""))))

  /** F16: meta-refresh redirect URL from the first KB of an HTML payload
    * (reference: ntp_utils.py:169-183). '' when there is no refresh tag.
    * Relative redirects ('/...') are made absolute against the fetched
    * URL's scheme://host (hosts are expected lowercase and portless, as
    * urlparse().hostname yields).
    */
  def metaRefreshUrl(url: Column, contents: Column): Column = {
    val head = substring(contents, 1, 1024)
    // both attribute orders: http-equiv before or after content=
    val content = coalesce(
      nullif(regexp_extract(head,
        "(?i)<meta[^>]*http-equiv=[\"']?refresh[\"']?[^>]*content=[\"']([^\"']*)[\"']", 1), lit("")),
      nullif(regexp_extract(head,
        "(?i)<meta[^>]*content=[\"']([^\"']*)[\"'][^>]*http-equiv=[\"']?refresh[\"']?", 1), lit("")))
    // try_: a bare-reload content="0" has no ';' — ANSI element_at would
    // throw where the Scala mirror (metaRefreshTarget) returns ""
    val after = trim(try_element_at(split(content, ";"), lit(2)))
    val redir = when(lower(after).startsWith("url="),
      replace(after.substr(lit(5), length(after)), lit("'"), lit("")))
    val scheme = regexp_extract(url, "^([a-z]+)://", 1)
    val host = regexp_extract(url, "^[a-z]+://([^/]+)", 1)
    when(redir.isNull, lit(""))
      .when(redir.startsWith("/"), concat(scheme, lit("://"), host, redir))
      .otherwise(redir)
  }
}
