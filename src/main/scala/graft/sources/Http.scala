package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed HTTP fetch stage — the reference's REST ingest loop
  * (dags/etl.py:26-35: one sequential `requests.get` per city, with an
  * inter-call sleep at etl.py:136) re-expressed for Spark's execution
  * model:
  *
  *  - the URL list is a Dataset that fans out over executors via
  *    `mapPartitions` — N partitions fetch concurrently, each partition
  *    sequentially (the polite-crawl shape);
  *  - `delayMs` is the reference's rate-limit sleep, applied BETWEEN
  *    requests within a partition, so cluster-wide request rate is
  *    bounded by `partitions × 1000/delayMs` QPS;
  *  - failures NEVER throw: network errors and non-200 statuses surface
  *    as rows (status / error columns), so one dead endpoint out of
  *    10 000 costs one bad record, not the job. Downstream, the S3
  *    status gate (Flatten.badRecords) routes them to the bad-record
  *    channel.
  *
  * Plain `HttpURLConnection` (JDK) — no extra dependencies, and the
  * per-partition loop amortizes nothing heavier than a keep-alive pool.
  */
object Http {

  /** One fetch outcome. `status` is the HTTP code, or -1 when no
    * response was obtained (connect/read failure, `error` set). */
  final case class Fetched(url: String, status: Int, body: String, error: String)

  /** JSON string-literal escaping for the synthesized error envelope.
    * Exception messages routinely carry newlines and other control
    * characters; an envelope that fails `from_json` would lose its
    * cod/message detail in the quarantine channel, so every char below
    * 0x20 is escaped (\n, \r, \t named; the rest as \u00XX). */
  private[sources] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"'  => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def fetchOne(url: String, connectTimeoutMs: Int = 5000,
               readTimeoutMs: Int = 10000): Fetched =
    try {
      new URI(url).toURL.openConnection() match {
        case conn: HttpURLConnection =>
          conn.setConnectTimeout(connectTimeoutMs)
          conn.setReadTimeout(readTimeoutMs)
          conn.setRequestProperty("Accept", "application/json")
          val status = conn.getResponseCode
          val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
          val body =
            if (stream == null) ""
            else try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
            finally stream.close()
          Fetched(url, status, body, null)
        case other => // ftp:, file:, mailto:… — a bad row, never a thrown task
          Fetched(url, -1, null, s"unsupported scheme: ${other.getClass.getSimpleName}")
      }
    } catch {
      case e: IOException => Fetched(url, -1, null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      case e: IllegalArgumentException => Fetched(url, -1, null, s"bad url: ${e.getMessage}")
      case e: java.net.URISyntaxException => Fetched(url, -1, null, s"bad url: ${e.getMessage}")
    }

  /** Fetch every URL in `urls`, `partitions`-wide, `delayMs` apart within
    * each partition. Returns ALL outcomes — callers split on
    * `status === 200` (or feed the bodies to a gate that does). */
  def fetch(urls: Dataset[String], partitions: Int = 8, delayMs: Long = 0,
            connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000): Dataset[Fetched] = {
    import urls.sparkSession.implicits._
    urls.repartition(math.max(1, partitions)).mapPartitions { it =>
      var first = true
      it.map { url =>
        if (!first && delayMs > 0) Thread.sleep(delayMs)
        first = false
        fetchOne(url, connectTimeoutMs, readTimeoutMs)
      }
    }
  }

  /** [[graft.weather.Ingest.PayloadSource]] over a URL list: 200-bodies
    * pass through verbatim; anything else becomes the OpenWeather-style
    * error envelope (`{"cod": …, "message": …}`) that the downstream
    * status gate (SURVEY.md §2.1 S3) routes to the bad-record channel —
    * same contract as the reference's non-200 branch (etl.py:31-35). */
  final case class HttpSource(urls: Seq[String], partitions: Int = 8,
                              delayMs: Long = 0)
      extends graft.weather.Ingest.PayloadSource {
    def fetch(spark: SparkSession): Dataset[String] = {
      import spark.implicits._
      Http.fetch(spark.createDataset(urls), partitions, delayMs).map { f =>
        if (f.status == 200 && f.body != null && f.body.nonEmpty) f.body
        else if (f.body != null && f.body.nonEmpty) f.body // API error JSON: has its own cod
        else {
          // no usable body. The envelope's cod must NEVER read "200" — a
          // truncated 200 (empty body) would sail through the status gate
          // and merge a row of nulls into the fact
          val cod = if (f.status == 200) "empty_body" else f.status.toString
          val msg = jsonEscape(Option(f.error).getOrElse(s"http ${f.status}"))
          s"""{"cod":"$cod","message":"$msg"}"""
        }
      }
    }
  }
}
