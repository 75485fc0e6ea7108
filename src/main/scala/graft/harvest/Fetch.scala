package graft.harvest

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Document-harvest fetch stage (SURVEY §2.1 S11, §3.2).
  *
  * The reference fetches every linked document from the driver, one URL at
  * a time, with a per-host politeness sleep (reference:
  * nextplib/ntp_entry.py:124-216 `store_document`; get_documents.py:177-180
  * delay loop; ntp_constants.py:10-13 TIMEOUT=10s / MAX_REDIRECTS=30).
  *
  * Spark-first re-expression: repartition the URL set BY HOST so each
  * partition holds one (or few) hosts, then `mapPartitions` with a local
  * rate limiter — per-host politeness becomes per-partition throttling,
  * and the fetch fan-out scales with executors while never hammering a
  * single server from many tasks at once.
  *
  * This container has no egress, so the actual HTTP call is injected
  * (`fetcher`); production would pass a java.net.http.HttpClient-based
  * implementation honoring timeout/redirect caps. The default fetcher is a
  * deterministic stub that "downloads" a digest of the URL — the Spark
  * plumbing (partitioning, throttling, status accounting, whitelist) is
  * real and tested.
  */
object Fetch {

  /** Accepted document types (reference: ntp_constants.py:3-8). */
  val AcceptedTypes: Set[String] =
    Set("pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx", "odt", "ods",
      "odp", "rtf", "txt", "html", "htm", "zip", "xml")

  /** Harvest status codes (reference: ntp_constants.py:15-20). */
  object Status {
    val Ok = "ok"
    val Skipped = "skipped"
    val UnknownType = "unknown_type"
    val Error = "error"
  }

  case class FetchResult(url: String, status: String, contentType: String, nBytes: Long,
                         contentDisposition: String = "")

  /** Deterministic no-egress stub: succeeds for whitelisted extensions,
    * fails every Nth URL to exercise the error path. Every 3rd success
    * carries a Content-Disposition filename so the F15 sniff path is
    * exercised end-to-end.
    */
  def stubFetcher(url: String): FetchResult = {
    val ext = url.substring(url.lastIndexOf('.') + 1).toLowerCase
    if (!AcceptedTypes.contains(ext)) FetchResult(url, Status.UnknownType, "", 0L)
    else if (math.abs(url.hashCode) % 50 == 0) FetchResult(url, Status.Error, "", 0L)
    else FetchResult(url, Status.Ok, s"application/$ext", (math.abs(url.hashCode) % 100000).toLong,
      if (math.abs(url.hashCode) % 3 == 0) s"""attachment; filename="download.$ext"""" else "")
  }

  /** Plain-Scala mirror of [[UrlSniff.metaRefreshUrl]] for use inside the
    * fetch loop (the Column form runs in the engine, this one runs on the
    * fetching executor): same first-KB regex, both attribute orders, same
    * relative-URL resolution. FetchSpec asserts the two implementations
    * agree on shared fixtures.
    */
  private[graft] def metaRefreshTarget(url: String, contents: String): String = {
    val head = contents.take(1024)
    val p1 = "(?i)<meta[^>]*http-equiv=[\"']?refresh[\"']?[^>]*content=[\"']([^\"']*)[\"']".r
    val p2 = "(?i)<meta[^>]*content=[\"']([^\"']*)[\"'][^>]*http-equiv=[\"']?refresh[\"']?".r
    val content = p1.findFirstMatchIn(head).map(_.group(1))
      .orElse(p2.findFirstMatchIn(head).map(_.group(1))).getOrElse("")
    val parts = content.split(";")
    val after = if (parts.length >= 2) parts(1).trim else ""
    if (!after.toLowerCase.startsWith("url=")) ""
    else {
      val redir = after.substring(4).replace("'", "")
      if (redir.startsWith("/")) {
        val m = "^([a-z]+)://([^/]+)".r.findFirstMatchIn(url)
        m.map(x => s"${x.group(1)}://${x.group(2)}$redir").getOrElse(redir)
      } else redir
    }
  }

  /** Production fetcher body (S11; reference: ntp_entry.py:124-216
    * `store_document`, ntp_constants.py:10-13): java.net.http GET with
    * the reference's contract — `timeoutMs` per request (default 10 s),
    * at most `maxRedirects` 3xx hops (default 30), plus ONE meta-refresh
    * hop when an HTML body carries the F16 tag. Any protocol error,
    * timeout, redirect-cap breach, or non-2xx terminal status maps to
    * Status.Error — the harvest pipeline treats errors as data, never as
    * exceptions. Pass the result to `fetchAll(fetcher = ...)`; unit
    * tested against an in-process HTTP server (the sandbox has no
    * egress, so the default everywhere else stays the stub).
    */
  /** One HttpClient per executor JVM per timeout config, resolved through
    * the (static, never-serialized) companion — the fetcher lambda closes
    * only over `timeoutMs`/`maxRedirects`. A client captured in the
    * closure directly would make the fetcher non-serializable as soon as
    * it was invoked once on the driver (the initialized LazyRef holds the
    * jdk client), and would build one client (with never-shut-down
    * selector threads) per task instead of per JVM.
    */
  private val clientCache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.net.http.HttpClient]()
  private def clientFor(timeoutMs: Long): java.net.http.HttpClient =
    clientCache.computeIfAbsent(timeoutMs, t =>
      java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NEVER) // manual loop: the cap is OURS
        .connectTimeout(java.time.Duration.ofMillis(t))
        .build())

  /** One GET journey (redirect + meta-refresh hops). Returns the result
    * plus whether a failure is RETRYABLE: transport errors and 5xx are
    * transient (a retry can succeed); 4xx and the redirect-cap breach
    * are deterministic — retrying them only re-hammers the server.
    */
  private def fetchOnce(url0: String, timeoutMs: Long,
                        maxRedirects: Int): (FetchResult, Boolean) = {
    try {
      val client = clientFor(timeoutMs)
      var url = url0
      var redirects = 0
      var metaHops = 0
      var out: (FetchResult, Boolean) = null
      while (out == null) {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        val status = resp.statusCode()
        val loc = resp.headers().firstValue("Location").orElse(null)
        if (status >= 300 && status < 400 && loc != null) {
          redirects += 1
          if (redirects > maxRedirects) out = (FetchResult(url0, Status.Error, "", 0L), false)
          else url = java.net.URI.create(url).resolve(loc).toString
        } else if (status >= 200 && status < 300) {
          val ct = resp.headers().firstValue("Content-Type").orElse("")
          val cd = resp.headers().firstValue("Content-Disposition").orElse("")
          val body = resp.body()
          val refresh =
            if (ct.startsWith("text/html") && metaHops == 0)
              metaRefreshTarget(url, new String(body, java.nio.charset.StandardCharsets.UTF_8))
            else ""
          // resolve document-relative targets against the page URL —
          // same treatment the 3xx branch gives Location headers (an
          // unresolved "next.pdf" would blow up URI parsing and turn a
          // successful fetch into Status.Error)
          if (refresh.nonEmpty) {
            metaHops = 1
            url = java.net.URI.create(url).resolve(refresh).toString
          }
          else out = (FetchResult(url0, Status.Ok, ct, body.length.toLong, cd), false)
        } else out = (FetchResult(url0, Status.Error, "", 0L), status >= 500)
      }
      out
    } catch {
      case _: Exception => (FetchResult(url0, Status.Error, "", 0L), true)
    }
  }

  /** `retries`/`backoffMs`: transient failures (5xx, transport errors)
    * are re-attempted up to `retries` extra times with exponential
    * backoff (backoffMs, 2x per attempt) — beyond-reference hardening
    * (the reference fetch is single-shot). Because fetchAll co-locates
    * each host in one partition and fetches it sequentially, the backoff
    * sleep doubles as per-host load-shedding: a struggling server sees
    * the whole host queue pause, not one URL's. Deterministic failures
    * (4xx, redirect cap) are never retried.
    */
  def httpFetcher(timeoutMs: Long = 10000L, maxRedirects: Int = 30,
                  retries: Int = 2, backoffMs: Long = 500L): String => FetchResult = {
    (url0: String) => {
      var attempt = 0
      var res: FetchResult = null
      while (res == null) {
        val (r, retryable) = fetchOnce(url0, timeoutMs, maxRedirects)
        if (r.status != Status.Error || !retryable || attempt >= retries) res = r
        else { Thread.sleep(backoffMs << attempt); attempt += 1 }
      }
      res
    }
  }

  /** Host-partitioned, rate-limited fetch. `delayMs` is the per-host
    * politeness delay; `skipServers` the configured bad-host skip list
    * (reference: secrets.yml.sample:39-63). Returns a status DataFrame.
    */
  def fetchAll(urls: DataFrame, urlCol: String, hostPartitions: Int = 32,
               delayMs: Long = 0L, skipServers: Set[String] = Set.empty,
               fetcher: String => FetchResult = stubFetcher): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    // errors are DATA here, never exceptions: try_parse_url (ANSI
    // parse_url throws on one malformed URL and kills the batch), and
    // rows that are never fetched still land in the ledger — skip-listed
    // hosts as status=skipped (the Status code existed and was never
    // emitted), unparseable URLs as status=error. The old NOT-IN filter
    // also silently dropped NULL hosts by three-valued logic.
    val withHost = urls.select(col(urlCol).as("url"))
      .withColumn("host", try_parse_url(col("url"), lit("HOST")))
    val skipListed =
      if (skipServers.isEmpty) lit(false)
      else coalesce(col("host").isin(skipServers.toSeq: _*), lit(false))
    val ledgerOnly = withHost.filter(col("host").isNull || skipListed)
      .select(col("url"),
        when(col("host").isNull, lit(Status.Error)).otherwise(lit(Status.Skipped)).as("status"),
        lit("").as("contentType"), lit(0L).as("nBytes"),
        lit("").as("contentDisposition"))
    val eligible = withHost.filter(col("host").isNotNull && !skipListed)
      // co-locate each host in one partition -> the politeness delay below
      // is a true per-host rate limit even with many executors
      .repartition(hostPartitions, col("host"))
    val results: Dataset[FetchResult] = eligible.select(col("url"), col("host"))
      .as[(String, String)]
      .mapPartitions { it =>
        // per-HOST sub-queues within the shared partition: the delay
        // throttles consecutive hits on the same server; hosts that
        // happen to share a partition don't wait on each other
        val lastHit = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (u, h) =>
          if (delayMs > 0) {
            val wait = lastHit.get(h)
              .map(t => delayMs - (System.nanoTime() - t) / 1000000L).getOrElse(0L)
            if (wait > 0) Thread.sleep(wait)
            lastHit(h) = System.nanoTime()
          }
          fetcher(u)
        }
      }
    // F15 header sniff + F20 acceptance on the fetched headers (Column
    // algebra — UrlSniff — so the sniff itself is codegen'd, not UDF)
    results.toDF().unionByName(ledgerOnly)
      .withColumn("doc_type", UrlSniff.fileTypeFromHeaders(
        nullif(col("contentType"), lit("")), nullif(col("contentDisposition"), lit(""))))
      .withColumn("accepted", col("doc_type").isin(AcceptedTypes.toSeq: _*))
  }
}
