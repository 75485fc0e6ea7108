package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CanonicalUrl
import graft.ops.Dedup

/** URL canonicalization: the documented normalization steps on
  * adversarial inputs (mixed-case percent escapes, ports, fragments,
  * tracking params, trailing slashes/dots, userinfo, opaque non-URLs),
  * SQL-registration parity, and the keyed dedup operator on top.
  */
class UrlCanonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def c(s: String): String = CanonicalUrl.canonicalize(s)

  test("scheme/host case, default ports, trailing host dots") {
    assert(c("HTTPS://WWW.Example.ES/Path") == "https://www.example.es/Path")
    assert(c("http://host.es:80/a") == "http://host.es/a")
    assert(c("https://host.es:443/a") == "https://host.es/a")
    // the OTHER scheme's default port is NOT dropped
    assert(c("http://host.es:443/a") == "http://host.es:443/a")
    assert(c("https://host.es:8443/a") == "https://host.es:8443/a")
    assert(c("https://host.es.:443/a") == "https://host.es/a")
    assert(c("https://host.es../a") == "https://host.es/a")
    // a bare colon (empty port) drops
    assert(c("https://host.es:/a") == "https://host.es/a")
  }

  test("fragments drop; path case is preserved (paths are case-sensitive)") {
    assert(c("https://h.es/Docs/X?q=1#section-2") == "https://h.es/Docs/X?q=1")
    assert(c("https://h.es/#") == "https://h.es/")
    assert(c("https://h.es#frag") == "https://h.es/")
  }

  test("reserved escapes uppercase their hex; malformed escapes are left alone") {
    assert(c("https://h.es/a%2fb%3Dc") == "https://h.es/a%2Fb%3Dc")
    assert(c("https://h.es/a?x=%2fa") == "https://h.es/a?x=%2Fa")
    // '%g1' is not hex, trailing '%' and '%a' are incomplete: untouched
    assert(c("https://h.es/a%g1b") == "https://h.es/a%g1b")
    assert(c("https://h.es/a%") == "https://h.es/a%")
    assert(c("https://h.es/a%a") == "https://h.es/a%a")
  }

  test("unreserved escapes DECODE (RFC 3986 §6.2.2.2); reserved never do") {
    // %7E '~', %41 'A', %61 'a', %30 '0', %2D '-', %2E '.', %5F '_'
    assert(c("http://h.es/%7Euser") == c("http://h.es/~user"))
    assert(c("https://h.es/%41%61%30%2d%2e%5f%7e") == "https://h.es/Aa0-._~")
    assert(c("https://h.es/p?t=%7eu") == "https://h.es/p?t=~u")
    // the boundary cases around the unreserved ranges stay encoded:
    // %2F '/' (below '0'-'9' is %2D..%2E then %2F), %40 '@', %5B '[',
    // %60 '`', %7B '{' — all reserved or sub-delim territory
    assert(c("https://h.es/%2F%40%5B%60%7B") == "https://h.es/%2F%40%5B%60%7B")
    // a decoded unreserved char inside a param VALUE must not disturb
    // the later split/sort (decoded bytes are never separators)
    assert(c("https://h.es/p?b=%7Ex&a=1") == "https://h.es/p?a=1&b=~x")
  }

  test("trailing slashes strip; the root path survives; empty path becomes '/'") {
    assert(c("https://h.es/docs/") == "https://h.es/docs")
    assert(c("https://h.es/docs//") == "https://h.es/docs")
    assert(c("https://h.es/") == "https://h.es/")
    assert(c("https://h.es") == "https://h.es/")
    assert(c("https://h.es?q=1") == "https://h.es/?q=1")
  }

  test("tracking params drop (any case), survivors sort, empty sets drop the '?'") {
    assert(c("https://h.es/p?b=2&a=1") == "https://h.es/p?a=1&b=2")
    assert(c("https://h.es/p?utm_source=x&a=1&UTM_Campaign=y&gclid=z") ==
      "https://h.es/p?a=1")
    assert(c("https://h.es/p?utm_source=x") == "https://h.es/p")
    assert(c("https://h.es/p?a=1&&b=2") == "https://h.es/p?a=1&b=2")
    // a bare-name param (no '=') is kept and sorted by its name
    assert(c("https://h.es/p?flag&a=1") == "https://h.es/p?a=1&flag")
    // the mc_ analytics prefix drops like utm_
    assert(c("https://h.es/p?mc_cid=1&mc_eid=2&a=1") == "https://h.es/p?a=1")
  }

  test("ambiguous names (ref/referrer/spm) are KEPT by default, droppable via the extra set") {
    // many sites use ?ref= meaningfully (branch pages, referral codes) —
    // dropping it unconditionally would collapse distinct resources
    assert(c("https://h.es/p?ref=main&a=1") == "https://h.es/p?a=1&ref=main")
    assert(c("https://h.es/p?spm=x") == "https://h.es/p?spm=x")
    val viaExtra = spark.range(1)
      .select(CanonicalUrl.canonical_url(
        lit("https://h.es/p?ref=main&SPM=x&a=1"), Set("ref", "spm")))
      .as[String].head()
    assert(viaExtra == "https://h.es/p?a=1")
    // extra names are validated (they ride generated code as a literal)
    intercept[IllegalArgumentException] {
      spark.range(1).select(CanonicalUrl.canonical_url(lit("x"), Set("bad\"name")))
        .collect()
    }
  }

  test("ports accept ASCII digits only; a Unicode-digit 'port' is just part of the host") {
    // U+0660 ARABIC-INDIC DIGIT ZERO passes Char.isDigit but is not a port
    val u = "https://h.es:٠٠/a"
    assert(c(u) == u)
    // only the six explicit ASCII whitespace chars trim — U+00A0 stays
    assert(c("\t\r\n https://h.es/a \f") == "https://h.es/a")
    assert(c("\u00A0https://h.es/a") == "\u00A0https://h.es/a")
  }

  test("whitespace trims; userinfo is preserved; non-http(s) and opaque ids pass through") {
    assert(c("  https://h.es/a  ") == "https://h.es/a")
    assert(c("https://user:pw@h.ES/a") == "https://user:pw@h.es/a")
    assert(c("ftp://Host.ES/file") == "ftp://Host.ES/file")
    assert(c("not a url") == "not a url")
    assert(c(" doc_12345 ") == "doc_12345")
  }

  test("SQL registration parity: canonical_url in plain SQL == the Column API") {
    graft.functions.GraftExtensions.registerAll(spark)
    val df = Seq("HTTPS://Host.ES:443/Docs/?b=2&utm_source=x&a=%2fv#f",
      "http://h.es:80//", "not a url").toDF("u")
    val viaCol = df.select(CanonicalUrl.canonical_url(col("u"))).as[String].collect().toSeq
    df.createOrReplaceTempView("urls_tmp")
    val viaSql = spark.sql("SELECT canonical_url(u) FROM urls_tmp").as[String].collect().toSeq
    assert(viaCol == viaSql)
    assert(viaCol.head == "https://host.es/Docs?a=%2Fv&b=2")
  }

  test("cli urldedup: collapses to canonical keys and lands parquet") {
    val root = java.nio.file.Files.createTempDirectory("graft_url_cli").toString
    Seq((1L, "HTTPS://H.ES/a?b=2&a=1#x"), (2L, "https://h.es:443/a/?a=1&b=2"),
      (3L, "https://other.es/z")).toDF("id", "url").write.parquet(root + "/urls")
    graft.cli.Main.run(spark, "urldedup", Array(
      "--in", root + "/urls", "--out", root + "/canon"))
    val got = spark.read.parquet(root + "/canon")
    assert(got.count() == 2)
    assert(got.filter(col("canon_url") === "https://h.es/a?a=1&b=2")
      .head().getAs[Long]("keep_id") == 1L)
  }

  test("urlCanonicalKeep collapses dirt variants to one min-id row per canonical key") {
    val df = Seq(
      (10L, "HTTPS://H.ES/a?b=2&a=1#x"),
      (7L, "https://h.es:443/a/?a=1&utm_source=m&b=2"),
      (9L, "https://h.es/a?a=1&b=2"),
      (20L, "https://other.es/a?a=1&b=2")).toDF("id", "url")
    val got = Dedup.urlCanonicalKeep(df, "id", "url")
      .orderBy(col("canon_url")).as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("https://h.es/a?a=1&b=2", 7L, 3L),
      ("https://other.es/a?a=1&b=2", 20L, 1L)))
  }
}
