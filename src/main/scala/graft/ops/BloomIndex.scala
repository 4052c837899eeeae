package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.sketch.BloomFilter

/** File-level Bloom-filter index over a parquet directory — the point-lookup
  * complement to [[ZoneMap]]. A min/max envelope prunes range predicates on
  * CLUSTERED columns but is useless for an equality probe on a
  * hash-distributed key (every file's [min,max] spans the whole domain); a
  * per-file Bloom filter answers "can this file contain key k?" regardless
  * of layout, which is why Parquet, Delta and Iceberg all grew bloom
  * metadata beside their min/max stats. Combined with a hash-clustered
  * layout (each key lands in exactly one file) a point lookup touches
  * O(1/nFiles) of the storage.
  *
  * Same correctness contract as [[ZoneMap]]: pruning is an optimization,
  * never a dependence. A Bloom filter has no false negatives, so a ruled-out
  * file provably holds no probed key; the full predicate is re-applied to
  * the survivors (false positives and co-resident rows filter out there);
  * and the pruned read scans the CURRENT listing minus the ruled-out set,
  * so a file appended after the index was built is never ruled out and a
  * compacted-away file's stale index row is ignored — a stale index can
  * only cost speed, never rows.
  *
  * Reference scope: at-scale superset, like [[ZoneMap]]/[[Layout]] — the
  * reference warehouse full-scans (`scripts/lambda_handler_warehouse.py`).
  */
object BloomIndex {

  /** Build the index in ONE scan: per file, row count and a Bloom filter
    * over `xxhash64(keyCol)`. `expectedItems`/`numBits` size the filter
    * (defaults: ~1M items at ~8 bits/item ⇒ ~2% fpp); the index is a small
    * table — one (file, bytes) row per file — meant to be persisted once
    * and consulted by every probe. The indexed column's DataType rides
    * along as a `key_type` column (JSON form, lossless round-trip) so
    * probes can cast keys to the exact type the build hashed — xxhash64 is
    * type-sensitive, and a type mismatch is a silent false NEGATIVE, the
    * one failure mode a bloom must never have. A format-native build would
    * lift parquet footer bloom pages instead of re-hashing row data. */
  def build(spark: SparkSession, dir: String, keyCol: String,
            expectedItems: Long = 1000000L,
            numBits: Long = 8388608L): DataFrame = {
    val table = spark.read.parquet(dir)
    val keyType = table.schema(keyCol).dataType
    table
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        bloomAgg(xxhash64(col(keyCol)), expectedItems, numBits).as("bloom"))
      .withColumn("key_type", lit(keyType.json))
  }

  /** `bloom_filter_agg` is a Catalyst expression Spark keeps off the public
    * FunctionRegistry (it backs the runtime bloom-join rule); wrap it
    * directly. Its binary output is the standard
    * `org.apache.spark.util.sketch.BloomFilter` serialization. */
  private def bloomAgg(child: Column, items: Long, bits: Long): Column =
    columnOf(new BloomFilterAggregate(expressionOf(child),
      Literal(items), Literal(bits)).toAggregateExpression())

  /** Files that MIGHT contain at least one probed key — the scan list for
    * an IN-list/point lookup. The probe is DISTRIBUTED: the blooms are
    * opened where the index rows live and only each file's (name, verdict)
    * reaches the driver — planner metadata the same size as the file
    * listing itself (~100 B/file), where collecting the blooms (the
    * pre-round-16 shape) cost the driver O(files × filter bytes): at the
    * default 1 MiB/file sizing a 10⁵-file index was a 100 GiB collect.
    * (Spark's own `might_contain` expression insists on a constant/
    * scalar-subquery filter because it exists for broadcast runtime join
    * pruning; a per-file metadata probe needs its own evaluation path.)
    * Keys are hashed with the same `XxHash64` expression the build used,
    * CAST to the indexed column's type first: xxhash64 is type-sensitive,
    * so probing a BIGINT column with an Int literal would hash differently
    * and silently LOSE files (a false negative — the one failure mode a
    * bloom must never have). The type is read PER ROW from the index's own
    * `key_type` column (every [[build]] output carries it): `key_type` is
    * per-file, and an index whose rows carry MIXED types — an old build
    * unioned with an incremental rebuild after the column widened, the
    * exact scenario `key_type` exists for — must probe each bloom at the
    * type its own row recorded, not one nondeterministically-chosen type
    * for all rows. An explicit `keyType` overrides every row; a
    * pre-`key_type` index with no override falls back to trusting the
    * keys' runtime types. A file whose keyed column was entirely null
    * holds only the null hash and is pruned (null never satisfies an
    * equality probe). Files absent from the index are NOT returned here —
    * [[prunedRead]] adds them back from the live listing (staleness
    * safety). Probe keys must be plain serializable literals (they ship
    * in the probe closure). */
  def candidateFiles(index: DataFrame, keys: Seq[Any],
                     keyType: Option[DataType] = None): Set[String] =
    probeAll(index, keys, keyType, fallbackType = None)
      .collect { case ProbedFile(f, true) => f }.toSet

  private[ops] case class ProbedFile(file: String, hit: Boolean)

  /** ONE action over the index frame (an uncached build pipeline executes
    * exactly once), returning every indexed file with its probe verdict.
    * Type resolution per row: `overrideType` wins, else the row's recorded
    * `key_type`, else `fallbackType`, else the keys' runtime types. */
  /** Driver-side envelope on the per-file (name, verdict) metadata collect:
    * ~100 B/row means the default 4M-file cap bounds the probe result near
    * ~400 MB — planner-metadata scale, same order as the file listing a
    * scan of that table needs anyway. An index past the cap fails LOUDLY
    * (the limit+1 collect never materializes more than cap+1 rows, so the
    * failure is an exception, not a driver OOM): at that file count the
    * per-file-bloom design wants partitioning (one index per table
    * partition, probed under the partition predicate), not a bigger
    * collect. Override per session via [[MaxProbedFilesKey]]. */
  val MaxProbedFilesKey = "spark.graft.bloomIndex.maxProbedFiles"
  val MaxProbedFilesDefault: Int = 4000000

  private def probeAll(index: DataFrame, keys: Seq[Any],
                       overrideType: Option[DataType],
                       fallbackType: Option[DataType]): Seq[ProbedFile] = {
    require(keys.nonEmpty, "bloom probe needs at least one key")
    val typeCol =
      if (index.columns.contains("key_type")) col("key_type")
      else lit(null).cast("string")
    val probeFn = udf(new BloomProbe(keys, overrideType, fallbackType))
    // An unparseable or nonpositive cap fails LOUDLY: a user raising the
    // cap past Int.MaxValue (or typo-ing it) must hear "your conf was
    // ignored", not hit the default-cap exception with no hint why. The
    // Int.MaxValue - 1 clamp keeps cap + 1 from overflowing limit().
    val cap = index.sparkSession.conf.getOption(MaxProbedFilesKey) match {
      case None => MaxProbedFilesDefault
      case Some(s) => s.toIntOption.filter(_ > 0) match {
        case Some(n) => n.min(Int.MaxValue - 1)
        case None => throw new IllegalArgumentException(
          s"$MaxProbedFilesKey='$s' is not a positive Int " +
            s"(max ${Int.MaxValue - 1}); set a valid value or unset it " +
            s"to use the default $MaxProbedFilesDefault")
      }
    }
    val rows = index.select(col("file"), probeFn(col("bloom"), typeCol).as("hit"))
      .limit(cap + 1)
      .collect()
    if (rows.length > cap) throw new IllegalStateException(
      s"bloom index holds more than $cap indexed files — past the driver " +
        s"metadata envelope (~100 B/file). Partition the index (one per " +
        s"table partition, probed under the partition predicate) or raise " +
        s"$MaxProbedFilesKey.")
    rows.map(r => ProbedFile(r.getString(0), r.getBoolean(1))).toSeq
  }

  /** Executor-side bloom probe. Hash sets are memoized per recorded type
    * (a handful of entries — one per distinct `key_type` in the index) in
    * a transient per-deserialization cache; `Cast`/`XxHash64` eval is
    * driver/executor-agnostic. Boxed-UDF cost is irrelevant here: the
    * probe runs over index METADATA rows (one per file), never data. */
  private class BloomProbe(keys: Seq[Any], overrideType: Option[DataType],
                           fallbackType: Option[DataType])
      extends ((Array[Byte], String) => Boolean) with Serializable {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    private def hashes(typeJson: String): Array[Long] =
      cache.computeIfAbsent(if (typeJson == null) "" else typeJson, _ => {
        val dt = overrideType
          .orElse(Option(typeJson).map(DataType.fromJson))
          .orElse(fallbackType)
        keyHashes(keys, dt).toArray
      })
    override def apply(bloom: Array[Byte], typeJson: String): Boolean =
      bloom != null && {
        val bf = BloomFilter.readFrom(new ByteArrayInputStream(bloom))
        hashes(typeJson).exists(bf.mightContainLong)
      }
  }

  private def keyHashes(keys: Seq[Any],
                        keyType: Option[DataType]): Seq[Long] =
    keys.map { k =>
      val lit = keyType match {
        case Some(dt) =>
          org.apache.spark.sql.catalyst.expressions.Cast(Literal(k), dt,
            evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
        case None => Literal(k)
      }
      new XxHash64(Seq(lit)).eval(null).asInstanceOf[Long]
    }

  /** Point-lookup read: current listing ∩ (bloom candidates ∪ unindexed
    * files), then the exact IN filter re-applied. Returns the frame plus
    * (selected, total) file counts so callers — and tests — can observe
    * the skipping. */
  def prunedRead(spark: SparkSession, dir: String, index: DataFrame,
                 keyCol: String, keys: Seq[Any]): ZoneMap.Pruned = {
    val table = spark.read.parquet(dir)
    val current = table.inputFiles
    // ONE action over the index (probeAll): an uncached index frame
    // re-executes its whole build pipeline per action, so deriving the
    // indexed-file set and the candidate set separately would scan twice.
    // Each row is probed with the type ITS bloom RECORDED at build time,
    // not the live table schema's: files written after a column widened
    // (int → long) change what the merged schema infers, and hashing probe
    // keys at the widened type misses every bloom built at the old type —
    // silent false-negative pruning over the old files. The live schema is
    // only the fallback for a pre-key_type index row.
    val probed = probeAll(index, keys, overrideType = None,
      fallbackType = Some(table.schema(keyCol).dataType))
    val indexed = probed.map(_.file).toSet
    val candidates = probed.collect { case ProbedFile(f, true) => f }.toSet
    val files = current.filter(f => candidates.contains(f) || !indexed.contains(f)).toSeq
    val predicate = col(keyCol).isin(keys: _*)
    val df =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], table.schema)
      // basePath: an explicit file list otherwise loses directory-derived
      // partition columns on partitioned layouts (root/date=.../part),
      // changing the pruned frame's schema vs the full-table read.
      else spark.read.option("basePath", dir).parquet(files: _*).filter(predicate)
    ZoneMap.Pruned(df, files.length, current.length)
  }
}
