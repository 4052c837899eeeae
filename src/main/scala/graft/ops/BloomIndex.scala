package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
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
    * an IN-list/point lookup. The probe runs on the DRIVER over collected
    * index rows (one bloom per file): this is planner metadata, the same
    * thing Delta/Iceberg hold in memory to build a scan's file list —
    * row data is never touched. (Spark's own `might_contain` expression
    * insists on a constant/scalar-subquery filter because it exists for
    * broadcast runtime join pruning; a per-file metadata probe is exactly
    * the driver-side case.) Keys are hashed with the same `XxHash64`
    * expression the build used, CAST to the indexed column's type first:
    * xxhash64 is type-sensitive, so probing a BIGINT column with an Int
    * literal would hash differently and silently LOSE files (a false
    * negative — the one failure mode a bloom must never have). The type is
    * read from the index's own `key_type` column when present (every
    * [[build]] output carries it), so callers cannot get this wrong; an
    * explicit `keyType` overrides it, and only a pre-`key_type` index with
    * no override falls back to trusting the keys' runtime types. A file
    * whose keyed column was entirely null holds only the null hash and is
    * pruned (null never satisfies an equality probe). Files absent from
    * the index are NOT returned here — [[prunedRead]] adds them back from
    * the live listing (staleness safety). */
  def candidateFiles(index: DataFrame, keys: Seq[Any],
                     keyType: Option[org.apache.spark.sql.types.DataType] = None): Set[String] = {
    val hasType = index.columns.contains("key_type")
    val cols = (Seq("file", "bloom") ++ (if (hasType) Seq("key_type") else Nil)).map(col)
    // ONE collect: the index may be an uncached build pipeline, and separate
    // collects for the type and the blooms would scan the data twice.
    val rows = index.select(cols: _*).collect()
    val dt = keyType.orElse(
      if (hasType && rows.nonEmpty)
        Some(org.apache.spark.sql.types.DataType.fromJson(
          rows.head.getAs[String]("key_type")))
      else None)
    probe(rows, keyHashes(keys, dt))
  }

  private def keyHashes(keys: Seq[Any],
                        keyType: Option[org.apache.spark.sql.types.DataType]): Seq[Long] = {
    require(keys.nonEmpty, "bloom probe needs at least one key")
    keys.map { k =>
      val lit = keyType match {
        case Some(dt) =>
          org.apache.spark.sql.catalyst.expressions.Cast(Literal(k), dt,
            evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
        case None => Literal(k)
      }
      new XxHash64(Seq(lit)).eval(null).asInstanceOf[Long]
    }
  }

  private def probe(idxRows: Array[Row], hashes: Seq[Long]): Set[String] =
    idxRows.flatMap { r =>
      val bf = BloomFilter.readFrom(
        new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
      if (hashes.exists(bf.mightContainLong)) Some(r.getString(0)) else None
    }.toSet

  /** Point-lookup read: current listing ∩ (bloom candidates ∪ unindexed
    * files), then the exact IN filter re-applied. Returns the frame plus
    * (selected, total) file counts so callers — and tests — can observe
    * the skipping. */
  def prunedRead(spark: SparkSession, dir: String, index: DataFrame,
                 keyCol: String, keys: Seq[Any]): ZoneMap.Pruned = {
    val table = spark.read.parquet(dir)
    val current = table.inputFiles
    // ONE collect of the index: an uncached index frame re-executes its
    // whole build pipeline per action, so deriving the indexed-file set and
    // the candidate set from separate collects would scan twice.
    val hasType = index.columns.contains("key_type")
    val idxRows = index.select(
      (Seq("file", "bloom") ++ (if (hasType) Seq("key_type") else Nil)).map(col): _*
    ).collect()
    val indexed = idxRows.map(_.getString(0)).toSet
    // Probe with the type the index RECORDED at build time, not the live
    // table schema's: files written after a column widened (int → long)
    // change what the merged schema infers, and hashing probe keys at the
    // widened type misses every bloom built at the old type — silent
    // false-negative pruning over the old files. The live schema is only
    // the fallback for a pre-key_type index.
    val recordedType =
      if (hasType && idxRows.nonEmpty)
        org.apache.spark.sql.types.DataType.fromJson(
          idxRows.head.getAs[String]("key_type"))
      else table.schema(keyCol).dataType
    val candidates = probe(idxRows, keyHashes(keys, Some(recordedType)))
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
