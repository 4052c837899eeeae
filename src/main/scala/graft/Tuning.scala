package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Input-size-derived session tuning — design rule #6 ("partitions scale
  * with data volume") applied to the batch engine, the same rule
  * `EventsStream.pinnedPartitionsFor` applies to streaming state.
  *
  * Why this exists: a fixed `spark.sql.shuffle.partitions` is correct only
  * at one data scale. The round-13 full-suite 64× sweep's worst non-scan
  * rows (q75 15.3×, q122 14.8×, the q15/q89/q10/q05 9–10× cluster) were all
  * shuffle volume through a core-count-pinned 32 partitions, and all
  * recovered with more (q122 measured 53.9 → 32.6 s at 256) — but only via
  * an env override, i.e. the 100 TB plan was opt-in. [[tuneFor]] makes it
  * the default plan: every `SparkEntry.queries` invocation derives the
  * setting from the corpus directory's bytes before building its frame.
  *
  * The rule: `clamp(defaultParallelism, dirBytes / 4 MiB, 4096)`.
  *  - Floor = the session's core count: below it a shuffle leaves cores
  *    idle; bench-scale dirs (sf0.1 ≈ 17 MB → 4) therefore resolve to the
  *    session default and every sf0.01/sf0.1 plan, hash, and timing is
  *    unchanged.
  *  - 4 MiB of compressed parquet per shuffle partition ≈ 30–50 MB of
  *    in-flight row data at this fixture's observed ~10× decode expansion —
  *    comfortable task size, and it reproduces the measured-good 256 at the
  *    sweep's 64× dir (~1.1 GB). Deployments with different compression or
  *    executor memory tune [[BytesPerPartitionKey]].
  *  - The cap bounds scheduler pressure (a 100 TB dir would otherwise
  *    derive 26M partitions). 4096 is the single-JVM bound; a real cluster
  *    raises [[MaxPartitionsKey]] toward 2–3× its total cores, and AQE
  *    (enabled in [[GraftSession]]) coalesces the overshoot at runtime —
  *    the derived value is the AQE *initial* partitioning in spirit.
  *
  * Overshoot is cheap (AQE coalesces empty/small partitions); undershoot is
  * the 64×-measured pathology. Derivation costs one memoized FS
  * content-summary per (dir) — a recursive listing on object stores, fine
  * for a corpus dir read thousands of times, and cached for the JVM's
  * lifetime (fixture dirs are immutable; a live deployment re-tunes per
  * session, not per file arrival).
  *
  * An explicit `SPARK_GRAFT_SHUFFLE_PARTITIONS` env override wins over the
  * derivation (the ScaleProbe experiment knob, and the operator's manual
  * escape hatch).
  */
object Tuning {

  /** Compressed input bytes one shuffle partition should carry. */
  val BytesPerPartitionKey = "spark.graft.tuning.bytesPerShufflePartition"

  /** Upper bound on derived shuffle partitions. */
  val MaxPartitionsKey = "spark.graft.tuning.maxShufflePartitions"

  private val DefaultBytesPerPartition: Long = 4L << 20
  private val DefaultMaxPartitions = 4096

  private val dirBytesCache = new ConcurrentHashMap[String, java.lang.Long]()

  /** Total bytes under `dir`, memoized for the JVM's lifetime. 0 when the
    * probe fails (missing dir, permission) — the floor then applies, which
    * is the pre-derivation behavior; the failure is logged, not swallowed
    * silently (a reliably-failing probe would otherwise silently pin every
    * query at core-count partitions — the q82-class degradation). */
  private def dirBytes(spark: SparkSession, dir: String): Long =
    dirBytesCache.computeIfAbsent(dir, d => {
      try {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[graft-tuning] input size probe failed for $d " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
              "shuffle partitions stay at the session floor")
          0L
      }
    })

  /** The derivation, pure and spec-testable. */
  private[graft] def partitionsForBytes(bytes: Long, floor: Int,
                                        bytesPerPartition: Long = DefaultBytesPerPartition,
                                        cap: Int = DefaultMaxPartitions): Int =
    math.max(floor, math.min(cap.toLong, bytes / math.max(1L, bytesPerPartition)).toInt)

  /** Derived shuffle-partition count for queries over `dir`. */
  def derivedShufflePartitions(spark: SparkSession, dir: String): Int = {
    val floor = spark.sparkContext.defaultParallelism
    val bpp = spark.conf.get(BytesPerPartitionKey,
      DefaultBytesPerPartition.toString).toLong
    val cap = spark.conf.get(MaxPartitionsKey, DefaultMaxPartitions.toString).toInt
    partitionsForBytes(dirBytes(spark, dir), floor, bpp, cap)
  }

  /** Set this session's `spark.sql.shuffle.partitions` for a query over
    * `dir`. Called by the `SparkEntry.queries` wrapper before each query
    * builder runs — the conf is read at that query's planning, so the
    * per-dir value is in force for its execution. Never throws: tuning is
    * an optimization, a failed probe leaves the session floor in place.
    *
    * NOT restored afterwards: the next query over any dir re-derives, and
    * interleaved consumers (ScaleProbe alternating two dirs) get the right
    * value per call. The env override, when present, is applied verbatim
    * and the derivation skipped. */
  def tuneFor(spark: SparkSession, dir: String): Unit =
    try {
      val target = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") match {
        case Some(n) => n.toInt
        case None => derivedShufflePartitions(spark, dir)
      }
      if (spark.conf.get("spark.sql.shuffle.partitions").toInt != target) {
        // One line per CHANGE (same-dir workloads log once, alternating-dir
        // probes log per switch): the derived plan scale should be visible
        // in operational logs, not inferred from timings.
        System.err.println(s"[graft-tuning] shuffle partitions -> $target for $dir")
        spark.conf.set("spark.sql.shuffle.partitions", target.toString)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft-tuning] tuneFor($dir) failed: ${e.getMessage}")
    }
}
