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

  test("percent-escape hex uppercases; malformed escapes are left alone, never decoded") {
    assert(c("https://h.es/a%2fb%3Dc") == "https://h.es/a%2Fb%3Dc")
    assert(c("https://h.es/a?x=%2fa") == "https://h.es/a?x=%2Fa")
    // '%g1' is not hex, trailing '%' and '%a' are incomplete: untouched
    assert(c("https://h.es/a%g1b") == "https://h.es/a%g1b")
    assert(c("https://h.es/a%") == "https://h.es/a%")
    assert(c("https://h.es/a%a") == "https://h.es/a%a")
    // %41 ('A', unreserved) is case-normalized but NOT decoded
    assert(c("https://h.es/%41") == "https://h.es/%41")
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
