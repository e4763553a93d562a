package graft.sources

import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Live-HTTP end-to-end fixture for the REST extraction surface
  * (SURVEY §2.1 S3/S4): a real localhost HTTP server (JDK built-in —
  * zero egress, zero new dependencies) serving a paginated collection
  * endpoint and a per-key detail endpoint, driven through the SAME
  * code paths the production extract uses — `RestFanout.fetchPerKey`
  * issuing real GETs from executor tasks, and the page-per-file
  * landing zone scanned by the `PagedJsonSource` DSv2 connector.
  * This closes the gap between the injected-fetcher specs and the
  * reference's actual extract loop (reference
  * `etls/openaq_etl.py:39-105` pages `/v3/locations?page=N`;
  * `lambda_functions/openaq_fetcher/extract_api.py:193-268` fans out
  * per-location requests).
  */
class LiveHttpSpec extends SparkSpec {
  import spark.implicits._

  private def httpGet(url: String): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    try {
      val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      require(conn.getResponseCode == 200, s"HTTP ${conn.getResponseCode}")
      body
    } finally conn.disconnect()
  }

  private def withServer(test: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    // paginated collection: 3 pages of 4 rows, then empty results
    server.createContext("/v1/locations", (ex: HttpExchange) => {
      val page = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").collectFirst { case s if s.startsWith("page=") => s.drop(5).toInt }
        .getOrElse(1)
      val rows =
        if (page > 3) Seq.empty
        else (0 until 4).map { i =>
          val id = (page - 1) * 4 + i
          s"""{"id": $id, "name": "loc$id", "active": ${id % 2 == 0}, "score": ${id * 1.5}}"""
        }
      reply(ex, rows.mkString("\n"))
    })
    // per-key detail endpoint
    server.createContext("/v1/measurements", (ex: HttpExchange) => {
      val key = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").collectFirst { case s if s.startsWith("key=") => s.drop(4).toLong }
        .getOrElse(0L)
      reply(ex, s"""{"location_id": $key, "value": ${key * 2.5}}""")
    })
    server.start()
    try test(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("per-key fan-out issues real HTTP GETs from executor tasks") {
    withServer { port =>
      val ids = spark.createDataset(Seq(1L, 2L, 3L, 4L, 5L).map(java.lang.Long.valueOf))
      // capture only the port (an Int) — the fetcher runs in executor
      // threads and must not drag the server into the closure
      val records = RestFanout.fetchPerKey(ids,
        id => Seq(httpGetStatic(s"http://127.0.0.1:$port/v1/measurements?key=$id")))
      val parsed = RestFanout.parsed(spark, records, StructType(Seq(
        StructField("location_id", LongType), StructField("value", DoubleType))))
      assert(parsed.count() == 5)
      assert(parsed.agg(sum("value")).head().getDouble(0) == (1 to 5).map(_ * 2.5).sum)
    }
  }

  test("resilient fan-out against a live endpoint keeps all keys, zero quarantined") {
    withServer { port =>
      val ids = spark.createDataset(Seq(10L, 20L, 30L).map(java.lang.Long.valueOf))
      val outcomes = RestFanout.fetchPerKeyResilient(ids,
        id => Seq(httpGetStatic(s"http://127.0.0.1:$port/v1/measurements?key=$id")),
        maxAttempts = 3, baseBackoffMs = 1L, sleeper = _ => ())
      assert(RestFanout.quarantined(outcomes).isEmpty)
      assert(RestFanout.records(outcomes).count() == 3)
    }
  }

  test("page-until-empty extract lands files that PagedJsonSource scans one-partition-per-page") {
    withServer { port =>
      // the reference's driver-side pagination loop: GET pages until an
      // empty response, land each page verbatim as one file
      val landing = Files.createTempDirectory("live_pages")
      var page = 1
      var done = false
      while (!done && page <= 100) {
        val body = httpGet(s"http://127.0.0.1:$port/v1/locations?page=$page")
        if (body.isEmpty) done = true
        else {
          Files.writeString(landing.resolve(f"page_$page%03d.json"), body)
          page += 1
        }
      }
      val df = spark.read.format(classOf[PagedJsonSource].getName)
        .schema(StructType(Seq(
          StructField("id", LongType), StructField("name", StringType),
          StructField("active", BooleanType), StructField("score", DoubleType))))
        .option("path", landing.toString).load()
      assert(df.rdd.getNumPartitions == 3, "one InputPartition per landed page")
      assert(df.count() == 12)
      assert(df.agg(sum("id")).head().getLong(0) == (0 until 12).sum)
    }
  }
}

/** Executor-callable HTTP GET (kept on a serializable object so task
  * closures only capture the URL string).
  */
object httpGetStatic extends (String => String) with Serializable {
  def apply(url: String): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    try {
      val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      require(conn.getResponseCode == 200, s"HTTP ${conn.getResponseCode}")
      body
    } finally conn.disconnect()
  }
}
