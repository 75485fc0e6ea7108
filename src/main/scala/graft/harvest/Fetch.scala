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

  /** Host-partitioned, rate-limited fetch. `delayMs` is the per-host
    * politeness delay; `skipServers` the configured bad-host skip list
    * (reference: secrets.yml.sample:39-63). Returns a status DataFrame.
    */
  def fetchAll(urls: DataFrame, urlCol: String, hostPartitions: Int = 32,
               delayMs: Long = 0L, skipServers: Set[String] = Set.empty,
               fetcher: String => FetchResult = stubFetcher): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val withHost = urls.select(col(urlCol).as("url"))
      .withColumn("host", parse_url(col("url"), lit("HOST")))
      .filter(!col("host").isin(skipServers.toSeq: _*))
      // co-locate each host in one partition -> the politeness delay below
      // is a true per-host rate limit even with many executors
      .repartition(hostPartitions, col("host"))
    val results: Dataset[FetchResult] = withHost.select("url").as[String]
      .mapPartitions { it =>
        it.map { u =>
          if (delayMs > 0) Thread.sleep(delayMs)
          fetcher(u)
        }
      }
    // F15 header sniff + F20 acceptance on the fetched headers (Column
    // algebra — UrlSniff — so the sniff itself is codegen'd, not UDF)
    results.toDF()
      .withColumn("doc_type", UrlSniff.fileTypeFromHeaders(
        nullif(col("contentType"), lit("")), nullif(col("contentDisposition"), lit(""))))
      .withColumn("accepted", col("doc_type").isin(AcceptedTypes.toSeq: _*))
  }
}
