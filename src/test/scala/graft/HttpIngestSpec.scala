package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import graft.sources.HttpIngest
import graft.streaming.UpsertPipeline
import graft.ops.EmissionsEtl

/** S2 HTTP ingest: the reference `DataDownloader` behavior (2xx → named
  * file, non-2xx → nothing) against a local JDK HttpServer, plus the full
  * lifecycle: HTTP fetch lands the file, the streaming pipeline picks it up. */
class HttpIngestSpec extends SparkSpec {

  private def withServer(csvBody: String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.csv", exchange => {
      val bytes = csvBody.getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.createContext("/missing.csv", exchange => {
      exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private val gas = EmissionsEtl.totalGhgRaw
  private val csv =
    "CountryCode,Year,Scenario,Category,Gas,Reported Value\n" +
      s"""AT,2030,WEM,Energy,"$gas",100.0""" + "\n" +
      s"""DE,2030,WEM,Energy,"$gas",50.0"""

  test("fetch lands the body under the requested name; non-2xx lands nothing") {
    withServer(csv) { baseUrl =>
      val landing = Files.createTempDirectory("graft_http_landing_").toString
      val landed = HttpIngest.fetch(s"$baseUrl/data.csv", landing, "eu_ghg_projections.csv")
      assert(landed.isDefined)
      assert(Files.readString(java.nio.file.Paths.get(landed.get)) == csv)
      assert(!Files.exists(
        java.nio.file.Paths.get(landing, ".eu_ghg_projections.csv.part")),
        "staging file must not remain after the atomic move")

      val missed = HttpIngest.fetch(s"$baseUrl/missing.csv", landing, "nope.csv")
      assert(missed.isEmpty)
      assert(!Files.exists(java.nio.file.Paths.get(landing, "nope.csv")))
      // staging names are dot-prefixed: even mid-download, a Spark file
      // source watching the landing dir sees nothing
      val visible = new java.io.File(landing).listFiles()
        .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
        .map(_.getName).toSet
      assert(visible == Set("eu_ghg_projections.csv"))
    }
  }

  test("transient 5xx retries with backoff until success; persistent 5xx lands nothing") {
    import java.util.concurrent.atomic.AtomicInteger
    val calls = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/flaky.csv", exchange => {
      if (calls.incrementAndGet() <= 2) exchange.sendResponseHeaders(503, -1)
      else {
        val bytes = csv.getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
      }
      exchange.close()
    })
    server.createContext("/down.csv", exchange => {
      exchange.sendResponseHeaders(503, -1)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val landing = Files.createTempDirectory("graft_http_retry_").toString
      val landed = HttpIngest.fetch(s"$base/flaky.csv", landing, "flaky.csv",
        maxAttempts = 3, backoffMs = 10)
      assert(landed.isDefined && calls.get() == 3,
        s"expected success on the 3rd attempt, calls=${calls.get()}")
      assert(Files.readString(java.nio.file.Paths.get(landed.get)) == csv)

      val down = HttpIngest.fetch(s"$base/down.csv", landing, "down.csv",
        maxAttempts = 2, backoffMs = 10)
      assert(down.isEmpty, "a server that never recovers must land nothing")
      assert(!Files.exists(java.nio.file.Paths.get(landing, "down.csv")))
    } finally server.stop(0)
  }

  test("crash-orphaned staging files are swept on the next fetch; fresh ones are not") {
    withServer(csv) { baseUrl =>
      val landing = Files.createTempDirectory("graft_http_sweep_")
      // a crashed prior download: old mtime, same target file name
      val stale = landing.resolve(".data.csv.deadbeef.part")
      Files.write(stale, "half a body".getBytes(StandardCharsets.UTF_8))
      Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3 * HttpIngest.StalePartMs / 2))
      // a concurrent in-flight download: fresh mtime — must survive
      val fresh = landing.resolve(".data.csv.cafe0001.part")
      Files.write(fresh, "streaming now".getBytes(StandardCharsets.UTF_8))
      // an unrelated file's staging: stale but different name — untouched
      val other = landing.resolve(".other.csv.deadbeef.part")
      Files.write(other, "x".getBytes(StandardCharsets.UTF_8))
      Files.setLastModifiedTime(other, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3 * HttpIngest.StalePartMs / 2))

      assert(HttpIngest.fetch(s"$baseUrl/data.csv", landing.toString, "data.csv").isDefined)
      assert(!Files.exists(stale), "stale orphan for the same file must be swept")
      assert(Files.exists(fresh), "a fresh (possibly in-flight) staging file must survive")
      assert(Files.exists(other), "another file's staging is not ours to sweep")
    }
  }

  test("HTTP fetch feeds the streaming pipeline end-to-end (reference lifecycle)") {
    withServer(csv) { baseUrl =>
      val landing = Files.createTempDirectory("graft_http_e2e_").toString
      val warehouse = Files.createTempDirectory("graft_http_wh_").toString
      val checkpoint = Files.createTempDirectory("graft_http_ckpt_").toString
      assert(HttpIngest.fetch(s"$baseUrl/data.csv", landing, "001.csv").isDefined)
      UpsertPipeline.runOnce(spark, landing, warehouse, checkpoint)
      val table = UpsertPipeline.currentTable(spark, warehouse).collect()
        .map(r => (r.getString(0), r.getDouble(5))).toMap
      assert(table == Map("Austria" -> 100.0, "Germany" -> 50.0))
    }
  }
}
