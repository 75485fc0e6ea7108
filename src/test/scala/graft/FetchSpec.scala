package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.harvest.{Fetch, UrlSniff}

/** S11 production fetcher against an in-process HTTP server: redirect
  * chain, redirect cap, meta-refresh hop, content-disposition, timeout,
  * and error mapping — no egress needed.
  */
class FetchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    def handle(path: String)(f: HttpExchange => Unit): Unit =
      server.createContext(path, (ex: HttpExchange) => { f(ex); ex.close() })
    def ok(ex: HttpExchange, ct: String, body: Array[Byte], extra: (String, String)*): Unit = {
      ex.getResponseHeaders.set("Content-Type", ct)
      extra.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
    }
    def redirect(ex: HttpExchange, to: String): Unit = {
      ex.getResponseHeaders.set("Location", to)
      ex.sendResponseHeaders(302, -1)
    }
    handle("/doc.pdf")(ex => ok(ex, "application/pdf", "PDFBYTES".getBytes))
    handle("/hop1")(ex => redirect(ex, "/hop2"))
    handle("/hop2")(ex => redirect(ex, s"$base/doc.pdf")) // absolute + relative both resolved
    handle("/loop")(ex => redirect(ex, "/loop"))
    handle("/meta.html")(ex => ok(ex, "text/html",
      """<html><head><meta http-equiv="refresh" content="0; url=/doc.pdf"></head></html>""".getBytes))
    handle("/meta_rel.html")(ex => ok(ex, "text/html",
      """<html><head><meta http-equiv="refresh" content="0; url=doc.pdf"></head></html>""".getBytes))
    handle("/cd.bin")(ex => ok(ex, "application/octet-stream", "ZZ".getBytes,
      "Content-Disposition" -> "attachment; filename=\"informe.docx\""))
    handle("/gone")(ex => ex.sendResponseHeaders(404, -1))
    server.start()
    try test(server, base) finally server.stop(0)
  }

  test("httpFetcher: 200, redirect chain, redirect cap, meta-refresh, 404, refused") {
    withServer { (_, base) =>
      val f = Fetch.httpFetcher(timeoutMs = 5000L, maxRedirects = 30)
      val direct = f(s"$base/doc.pdf")
      assert(direct.status == Fetch.Status.Ok && direct.contentType == "application/pdf"
        && direct.nBytes == 8L && direct.url == s"$base/doc.pdf")

      // 302 chain (relative then absolute Location) lands on the doc;
      // the RESULT keys by the ORIGINAL url, like the reference's store
      val hopped = f(s"$base/hop1")
      assert(hopped.status == Fetch.Status.Ok && hopped.contentType == "application/pdf"
        && hopped.url == s"$base/hop1")

      // redirect cap: a loop errors out instead of spinning
      assert(f(s"$base/loop").status == Fetch.Status.Error)
      // tighter cap trips earlier on a legitimate chain
      assert(Fetch.httpFetcher(5000L, maxRedirects = 1)(s"$base/hop1").status == Fetch.Status.Error)

      // F16: one meta-refresh hop from the HTML body to the document
      val meta = f(s"$base/meta.html")
      assert(meta.status == Fetch.Status.Ok && meta.contentType == "application/pdf")
      // a DOCUMENT-RELATIVE refresh target resolves against the page URL
      // (an unresolved "doc.pdf" would fail URI parsing -> Error)
      val metaRel = f(s"$base/meta_rel.html")
      assert(metaRel.status == Fetch.Status.Ok && metaRel.contentType == "application/pdf")

      // content-disposition carried through for the F15 sniff
      val cd = f(s"$base/cd.bin")
      assert(cd.status == Fetch.Status.Ok
        && cd.contentDisposition.contains("informe.docx"))

      assert(f(s"$base/gone").status == Fetch.Status.Error)
      // connection refused (nothing listens on the next port) -> error
      assert(f("http://127.0.0.1:1/x.pdf").status == Fetch.Status.Error)
    }
  }

  test("httpFetcher retry budget: 5xx backs off and recovers, 4xx never retried, budget exhaustion errors") {
    withServer { (server, base) =>
      // flaky endpoint: 503 twice, then 200
      val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/flaky.pdf", (ex: HttpExchange) => {
        if (flakyHits.incrementAndGet() <= 2) ex.sendResponseHeaders(503, -1)
        else {
          ex.getResponseHeaders.set("Content-Type", "application/pdf")
          ex.sendResponseHeaders(200, 2L); ex.getResponseBody.write("OK".getBytes)
        }
        ex.close()
      })
      // hard-down endpoint: always 500
      val downHits = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/down.pdf", (ex: HttpExchange) => {
        downHits.incrementAndGet(); ex.sendResponseHeaders(500, -1); ex.close()
      })
      val goneHits = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/gone2.pdf", (ex: HttpExchange) => {
        goneHits.incrementAndGet(); ex.sendResponseHeaders(404, -1); ex.close()
      })

      val f = Fetch.httpFetcher(5000L, 30, retries = 3, backoffMs = 1L)
      // transient 503s are absorbed by the budget
      assert(f(s"$base/flaky.pdf").status == Fetch.Status.Ok)
      assert(flakyHits.get() == 3, s"expected 2 failures + 1 success, saw ${flakyHits.get()} hits")
      // budget exhaustion: retries+1 total attempts, then Error-as-data
      assert(f(s"$base/down.pdf").status == Fetch.Status.Error)
      assert(downHits.get() == 4, s"budget is retries+1 attempts, saw ${downHits.get()}")
      // 4xx is deterministic — exactly one attempt, no server re-hammering
      assert(f(s"$base/gone2.pdf").status == Fetch.Status.Error)
      assert(goneHits.get() == 1, s"4xx must not be retried, saw ${goneHits.get()} hits")
      // single-shot config (retries = 0) keeps the reference's behavior
      val single = Fetch.httpFetcher(5000L, 30, retries = 0)
      downHits.set(0)
      assert(single(s"$base/down.pdf").status == Fetch.Status.Error && downHits.get() == 1)
    }
  }

  test("fetchAll drives the real fetcher end-to-end with sniff + acceptance") {
    withServer { (_, base) =>
      val urls = Seq(s"$base/doc.pdf", s"$base/cd.bin", s"$base/gone").toDF("url")
      // invoke the fetcher on the DRIVER first: a closure-captured client
      // would make the initialized fetcher non-serializable and kill the
      // mapPartitions job below (clients live in the per-JVM cache)
      val fetcher = Fetch.httpFetcher(5000L)
      assert(fetcher(s"$base/doc.pdf").status == Fetch.Status.Ok)
      val res = Fetch.fetchAll(urls, "url", hostPartitions = 2,
          fetcher = fetcher)
        .select("url", "status", "doc_type", "accepted")
        .collect().map(r => r.getString(0).split('/').last ->
          (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
      assert(res("doc.pdf") == ((Fetch.Status.Ok, "pdf", true)))
      // disposition filename wins over the octet-stream content type (F15)
      assert(res("cd.bin") == ((Fetch.Status.Ok, "docx", true)))
      assert(res("gone")._1 == Fetch.Status.Error)
    }
  }

  test("metaRefreshTarget (executor-side) agrees with UrlSniff.metaRefreshUrl (Column)") {
    val fixtures = Seq(
      ("https://ex.es/a", """<meta http-equiv="refresh" content="0; url=/next.pdf">"""),
      ("https://ex.es/a", """<meta content="5; URL=https://other.es/x" http-equiv="refresh">"""),
      ("https://ex.es/a", """<meta http-equiv='refresh' content='1; url=rel.html'>"""),
      ("https://ex.es/a", "<html>no refresh here</html>"),
      ("https://ex.es/a", ""))
    val viaColumn = fixtures.toDF("url", "contents")
      .select(UrlSniff.metaRefreshUrl(col("url"), col("contents")).as("r"))
      .collect().map(_.getString(0)).toSeq
    val viaScala = fixtures.map { case (u, c) => Fetch.metaRefreshTarget(u, c) }
    assert(viaScala == viaColumn)
  }
}
