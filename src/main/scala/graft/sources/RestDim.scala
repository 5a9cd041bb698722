package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7: REST-backed dimension fetch — the full request envelope.
  *
  * The reference fetches its config dimensions (metric mappings,
  * providers, custom metrics) driver-side with a bare
  * `new URL(url).openConnection` + one shared-key request header and no
  * error handling (`Set Up Delta Tables/Set up Delta tables for Slowly
  * changing Data.scala:144–153`, header name/value from its
  * `Configuration.scala:64–65`) — and its own comments record the
  * consequence: the fetch is commented out in places "to avoid the
  * note to fail due to HTTP 502 error" (same file:143). This module
  * models the envelope those notebooks needed:
  *
  *   - header-based shared-key auth (same `setRequestProperty` shape),
  *   - bounded retry with exponential backoff on TRANSIENT failures
  *     (the 5xx / connection-reset class that plagued the reference),
  *     no retry on permanent ones (4xx — a bad key never heals),
  *   - an injectable transport, so the envelope is unit-testable
  *     without a network and swappable for any HTTP client at
  *     deployment.
  *
  * Driver-side by design: dimension payloads are small config tables
  * (the reference parallelizes the fetched string into a DataFrame);
  * the cluster never opens connections. The fetch happens once per
  * refresh, then broadcasts through the usual dim-join path.
  */
object RestDim {

  /** One request: target + auth header (the reference's shared-key
    * pattern) + retry policy. `maxAttempts` counts the first try. */
  final case class Request(
      url: String,
      headers: Map[String, String] = Map.empty,
      maxAttempts: Int = 4,
      initialBackoffMs: Long = 250L,
      backoffFactor: Double = 4.0) {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    require(initialBackoffMs >= 0, "initialBackoffMs must be >= 0")
    require(backoffFactor >= 1.0, "backoffFactor must be >= 1.0")

    def withSharedKey(key: String): Request =
      copy(headers = headers + ("sharedKey" -> key))
  }

  /** Transport outcome. `Transient` failures (5xx, timeouts, resets)
    * are retried; `Permanent` ones (4xx, bad URL) are not. */
  sealed trait Result
  final case class Ok(body: String) extends Result
  final case class Transient(reason: String) extends Result
  final case class Permanent(reason: String) extends Result

  /** A transport takes the request and produces one attempt's result.
    * Injectable: tests pass fakes; [[urlTransport]] is the runtime
    * default (same java.net stack as the reference). */
  type Transport = Request => Result

  /** Runtime transport on `java.net.HttpURLConnection`: headers
    * applied via `setRequestProperty` (the reference's envelope),
    * 5xx mapped to Transient, other non-2xx to Permanent. Thrown
    * errors are classified, not blanket-retried: misconfigurations
    * that can never heal — a non-HTTP scheme (the ClassCastException
    * from `file:`/`ftp:` URLs), SSL/certificate failures, an unknown
    * protocol — are Permanent; connect/read timeouts and resets are
    * Transient. The connection is always disconnected (after draining
    * whichever stream is live) so retries never stack leaked sockets. */
  def urlTransport(connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000): Transport = { req =>
    var conn: java.net.HttpURLConnection = null
    try {
      conn = new java.net.URL(req.url).openConnection() match {
        case c: java.net.HttpURLConnection => c
        case other => throw new java.net.MalformedURLException(
          s"${req.url} is not an http(s) URL " +
            s"(got ${other.getClass.getName})")
      }
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      req.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val code = conn.getResponseCode
      if (code >= 200 && code < 300) {
        val src = scala.io.Source.fromInputStream(conn.getInputStream)
        try Ok(src.getLines().mkString("\n")) finally src.close()
      } else {
        // drain the error body so the socket can be reused/closed clean
        Option(conn.getErrorStream).foreach { es =>
          val src = scala.io.Source.fromInputStream(es)
          try src.getLines().foreach(_ => ()) finally src.close()
        }
        if (code >= 500) Transient(s"HTTP $code") else Permanent(s"HTTP $code")
      }
    } catch {
      case e: java.net.MalformedURLException   => Permanent(e.toString)
      case e: javax.net.ssl.SSLException       => Permanent(e.toString)
      case e: java.net.UnknownServiceException => Permanent(e.toString)
      case scala.util.control.NonFatal(e)      => Transient(e.toString)
    } finally {
      if (conn != null) conn.disconnect()
    }
  }

  /** Fetch with bounded exponential backoff. Returns the body, or
    * throws with the full attempt history (so a permanently-failing
    * dim fetch reads as ONE clear error, not the reference's silent
    * commented-out cell). `sleep` is injectable for tests. */
  def fetch(req: Request, transport: Transport,
      sleep: Long => Unit = Thread.sleep): String = {
    val attempts = scala.collection.mutable.ListBuffer[String]()
    var backoff = req.initialBackoffMs
    var attempt = 0
    while (attempt < req.maxAttempts) {
      attempt += 1
      transport(req) match {
        case Ok(body) => return body
        case Permanent(reason) =>
          throw new RuntimeException(
            s"RestDim.fetch(${req.url}): permanent failure on attempt " +
              s"$attempt: $reason" + attemptLog(attempts))
        case Transient(reason) =>
          attempts += s"attempt $attempt: $reason"
          if (attempt < req.maxAttempts) {
            sleep(backoff)
            backoff = (backoff * req.backoffFactor).toLong
          }
      }
    }
    throw new RuntimeException(
      s"RestDim.fetch(${req.url}): all ${req.maxAttempts} attempts " +
        "failed with transient errors" + attemptLog(attempts))
  }

  private def attemptLog(attempts: scala.collection.Seq[String]): String =
    if (attempts.isEmpty) "" else attempts.mkString(" [", "; ", "]")

  /** End-to-end dimension load: fetch the JSON payload through the
    * retrying envelope, parallelize it into a DataFrame (the
    * reference's `Seq(json).toDS` pattern via
    * [[FileSources.jsonString]]). */
  def loadDim(spark: SparkSession, req: Request, transport: Transport,
      sleep: Long => Unit = Thread.sleep): DataFrame =
    FileSources.jsonString(spark, fetch(req, transport, sleep))
}
