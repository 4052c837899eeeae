package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max index ("zone map") over a parquet directory, plus a
  * pruned-read path that consults the index BEFORE scanning — the external
  * data-skipping pattern every table format (Delta log, Iceberg manifests,
  * Hudi metadata table) builds on. Parquet already skips row groups inside
  * a file the scan has opened; the zone map removes whole files from the
  * scan's input split list, so a selective predicate over a
  * [[Layout.sortedWrite]] / [[Layout.zorderWrite]] clustered table touches
  * O(selectivity) of the storage instead of opening everything.
  *
  * Pruning is an optimization, never a correctness dependence: the
  * predicate is re-applied to whatever survives, so a stale or partial
  * index can only cost speed (extra files read), not results — the same
  * contract Delta's stats-based skipping documents.
  *
  * Reference scope: the reference warehouse has no layout/skipping layer at
  * all (full-table reads in `scripts/lambda_handler_warehouse.py`); this is
  * part of the at-scale superset, alongside [[Layout]] and [[Compaction]].
  */
object ZoneMap {

  /** Build the index in ONE scan: per file, row count and min/max of each
    * indexed column. Portable formulation of a stats-collection pass
    * (`ANALYZE` / Delta `OPTIMIZE`); a format-native implementation would
    * lift the same numbers straight from parquet footer statistics without
    * touching row data. The result is itself a small table — one row per
    * file — meant to be persisted once and consulted by every query.
    */
  def build(spark: SparkSession, dir: String, cols: String*): DataFrame = {
    require(cols.nonEmpty, "zone map needs at least one indexed column")
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files the index POSITIVELY rules out for a conjunctive box predicate:
    * indexed files whose per-column [min,max] envelope misses at least one
    * requested [lo,hi] interval. A file whose indexed column is entirely
    * null has a null envelope and is ruled out too: null never satisfies
    * BETWEEN, so it cannot contribute rows. ONE job; collects only file
    * paths — index-metadata scale, exactly what any table-format planner
    * materializes on the driver to build the scan's file list.
    */
  def ruledOutFiles(zoneMap: DataFrame, bounds: Seq[(String, Any, Any)]): Set[String] = {
    require(bounds.nonEmpty, "ruledOutFiles needs at least one interval")
    val overlap = bounds.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    // not(overlap) is null for a null envelope; null-ruled-out is intended
    zoneMap.filter(!coalesce(overlap, lit(false)))
      .select("file").collect().map(_.getString(0)).toSet
  }

  /** Scan the current directory listing MINUS the files the index rules
    * out, then re-apply the full predicate (files are kept whole, so
    * survivors still hold non-matching rows). Subtraction is what makes
    * staleness safe in the documented direction: a file appended AFTER the
    * index was built is absent from the index, is never ruled out, and is
    * scanned; a file compacted away is absent from the listing and its
    * stale index row is ignored. Returns the filtered frame plus
    * (selected, total) file counts so callers — and tests — can observe
    * how much the index actually skipped.
    */
  def prunedRead(spark: SparkSession, dir: String, zoneMap: DataFrame,
                 bounds: Seq[(String, Any, Any)]): Pruned = {
    val predicate = bounds.map { case (c, lo, hi) =>
      col(c).between(lit(lo), lit(hi))
    }.reduce(_ && _)
    val table = spark.read.parquet(dir)
    val current = table.inputFiles // listing only, no scan
    val files = {
      val dropped = ruledOutFiles(zoneMap, bounds)
      current.filterNot(dropped.contains).toSeq
    }
    val df =
      if (files.isEmpty) {
        // every file ruled out: empty frame with the table's schema, no scan
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], table.schema)
      } else spark.read.parquet(files: _*).filter(predicate)
    Pruned(df, files.length, current.length)
  }

  /** A pruned scan and how much the zone map skipped to produce it. */
  final case class Pruned(df: DataFrame, selectedFiles: Int, totalFiles: Int)
}
