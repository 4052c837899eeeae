package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Duration

/** HTTP → landing-directory ingest utility — the reference's
  * `DataDownloader` (`data_downloader.py:17-32`: GET a CSV endpoint, write
  * the body to a named file, return the path or None on a non-200).
  *
  * Deliberately OUT of the engine (SURVEY §2a S2): ingest drops a file into
  * the landing directory and the engine boundary starts there —
  * [[graft.streaming.UpsertPipeline]] picks up whatever lands. Kept to plain
  * `java.net.http` (no Spark session, no cluster resources): fetching one
  * file over HTTP is driver/cron work, not distributed work. At scale this
  * runs wherever the scheduler runs; many-file feeds fan out by calling it
  * per URL.
  *
  * Download is staged to a dot-prefixed `.<name>.part` sibling and
  * atomically renamed into the landing dir, so a file-watching stream never
  * observes a half-written file (the same torn-read discipline as
  * [[graft.ops.VersionedTable]]) — the dot prefix matters: Spark's file
  * sources ignore hidden files but would happily read a visible
  * `name.csv.part` mid-download.
  *
  * Transient failures retry with exponential backoff (the reference's O3
  * containment at the ingest edge): 5xx statuses and transport errors are
  * retried up to `maxAttempts`; 4xx is permanent and lands nothing
  * immediately. A server that never recovers yields None (report-and-skip);
  * a transport failure that never recovers propagates.
  */
object HttpIngest {

  /** Per-request timeout (headers deadline — see [[StalePartMs]] for why a
    * body transfer can outlive it). Single constant so the sweep's "2× the
    * request timeout" safety margin cannot silently drift from the timeout
    * actually configured on requests. */
  private val RequestTimeout: Duration = Duration.ofMinutes(5)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  /** Fetch `url` into `landingDir/fileName`. Returns the landed path, or
    * None on a non-2xx status (reference behavior: report and skip — the
    * pipeline simply sees no new file). */
  def fetch(url: String, landingDir: String, fileName: String,
            maxAttempts: Int = 3, backoffMs: Long = 100L): Option[String] = {
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    // Unique staging name per CALL: a fixed `.{name}.part` lets two
    // overlapping fetches of the same file (the classic cron-overlap case)
    // interleave their body writes into one staging file and atomically
    // publish the mixed bytes — exactly the torn read the staging exists
    // to prevent. Unique names keep each download private; the dot prefix
    // still hides it from Spark sources, and failure paths delete it.
    // What failure paths can't delete — a JVM crash mid-download — would
    // leak the unique-named staging file forever (nothing ever revisits
    // it), so entry sweeps siblings whose mtime is stale past
    // [[StalePartMs]] (2× the request timeout — see its scaladoc for why
    // 1× is not a liveness proof, and why the owner of a swept file
    // retries instead of failing).
    sweepStaleParts(dir, fileName)
    val part = dir.resolve(
      s".$fileName.${java.util.UUID.randomUUID().toString.take(8)}.part")
    val dest = dir.resolve(fileName)
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(RequestTimeout).GET().build()
    var attempt = 0
    var lastTransport: Option[java.io.IOException] = None
    while (attempt < maxAttempts) {
      attempt += 1
      val retryable =
        try {
          // TRUNCATE_EXISTING: a leftover staging file from a crashed prior
          // run must not contribute stale tail bytes to a shorter re-download
          val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(part,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
            java.nio.file.StandardOpenOption.WRITE))
          if (resp.statusCode() / 100 == 2) {
            // NoSuchFileException from the move means a concurrent fetch's
            // stale sweep took our staging file (possible only for a
            // transfer that stalled past StalePartMs) — this download is
            // lost but the loop retries it. NOT recorded as a transport
            // failure: the server was healthy (2xx), so if retries run out
            // the fetch must report-and-skip (None) like any other
            // lost-race outcome, not crash the caller.
            try {
              Files.move(part, dest, StandardCopyOption.ATOMIC_MOVE,
                StandardCopyOption.REPLACE_EXISTING)
              return Some(dest.toString)
            } catch {
              case _: java.nio.file.NoSuchFileException =>
                lastTransport = None
            }
            true
          } else {
            Files.deleteIfExists(part)
            if (resp.statusCode() < 500) return None // 4xx: permanent, skip
            lastTransport = None
            true
          }
        } catch {
          case e: java.io.IOException =>
            Files.deleteIfExists(part)
            lastTransport = Some(e)
            true
        }
      if (retryable && attempt < maxAttempts)
        Thread.sleep(backoffMs << (attempt - 1))
    }
    lastTransport.foreach(throw _) // transport never recovered: surface it
    None // server kept failing: report-and-skip, pipeline sees no file
  }

  /** How long a staging file may sit untouched before it is presumed
    * orphaned. Deliberately 2× the request timeout, not 1×: the JDK's
    * HttpRequest timeout covers only up to response headers — a body
    * transfer that stalls mid-stream has no timeout, so a live connection
    * CAN leave its staging file mtime-stale longer than the request
    * timeout. The margin (plus the owner's tolerance below: a swept
    * staging file turns into a retry, not data loss) keeps the sweep safe
    * for that case. */
  private[graft] val StalePartMs: Long = 2 * RequestTimeout.toMillis

  /** Best-effort removal of crash-orphaned `.{fileName}.*.part` staging
    * files. Mtime-gated so a concurrent in-flight download's staging file
    * (fresh by definition) is never touched; every failure is swallowed —
    * cleanup must never fail a fetch. */
  private def sweepStaleParts(dir: java.nio.file.Path, fileName: String): Unit =
    try {
      val cutoff = System.currentTimeMillis() - StalePartMs
      val listing = Files.list(dir)
      try {
        val it = listing.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith(s".$fileName.") && n.endsWith(".part") &&
              Files.getLastModifiedTime(p).toMillis < cutoff)
            Files.deleteIfExists(p)
        }
      } finally listing.close()
    } catch { case scala.util.control.NonFatal(_) => () }
}
