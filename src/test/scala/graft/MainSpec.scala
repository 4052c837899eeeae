package graft

/** The one-command pipeline runner (`graft.Main`): demo-mode end-to-end —
  * in-process HTTP server → landing dir → streaming upsert → embedded
  * Derby warehouse → sample SQL — and idempotent re-run (the reference
  * orchestrator's retry story: same checkpoint + warehouse, same state). */
class MainSpec extends SparkSpec {

  test("Main.run executes the full pipeline and the sample query; re-run is idempotent") {
    val opts = Map(
      "jdbc" -> "jdbc:derby:memory:graftmainspec;create=true",
      "landing" -> java.nio.file.Files.createTempDirectory("graft_mainspec_land_").toString,
      "checkpoint" -> java.nio.file.Files.createTempDirectory("graft_mainspec_ckpt_").toString)
    val sample = Main.run(spark, opts).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(sample.toSeq == Seq(
      ("Austria", 2030, "WEM", 101.5),
      ("France", 2035, "WAM", 42.0),
      ("Germany", 2030, "WEM", 57.25)))
    // Same checkpoint + warehouse: consumed files are skipped, a
    // re-delivered batch MERGEs to the same state — rows don't duplicate.
    val again = Main.run(spark, opts).collect()
    assert(again.length == 3, s"re-run duplicated rows: ${again.length}")
  }

  test("a fetch that lands nothing still yields a queryable empty warehouse") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/gone.csv", exchange => {
      exchange.sendResponseHeaders(404, -1); exchange.close()
    })
    server.start()
    try {
      val opts = Map(
        "url" -> s"http://127.0.0.1:${server.getAddress.getPort}/gone.csv",
        "jdbc" -> "jdbc:derby:memory:graftmain404;create=true",
        "landing" -> java.nio.file.Files.createTempDirectory("graft_main404_l_").toString,
        "checkpoint" -> java.nio.file.Files.createTempDirectory("graft_main404_c_").toString)
      assert(Main.run(spark, opts).collect().isEmpty,
        "no input must mean an empty sample, not a missing-table error")
    } finally server.stop(0)
  }
}
