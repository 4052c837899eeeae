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
      assert(!Files.exists(java.nio.file.Paths.get(landed.get + ".part")),
        "staging .part file must not remain after the atomic move")

      val missed = HttpIngest.fetch(s"$baseUrl/missing.csv", landing, "nope.csv")
      assert(missed.isEmpty)
      assert(!Files.exists(java.nio.file.Paths.get(landing, "nope.csv")))
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
