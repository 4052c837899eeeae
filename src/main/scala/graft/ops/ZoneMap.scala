package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  /** Build the index WITHOUT scanning row data: lift min/max/rowcount from
    * the parquet FOOTER statistics every writer already persists — what
    * Delta/Iceberg actually do at commit time, and the reason stats
    * collection there is free. Footer reads are metadata-sized (KBs per
    * file); this loops on the driver, which is exactly where table-format
    * planners hold this state (distribute over a file-list RDD if the file
    * COUNT itself is huge). Output schema matches [[build]], so the two are
    * interchangeable for [[ruledOutFiles]]/[[prunedRead]] — ZoneMapSpec
    * asserts envelope equality on real layouts.
    *
    * Statistics are per column chunk; the file envelope folds min-of-mins /
    * max-of-maxs, skipping all-null chunks (so an all-null file keeps the
    * null envelope, same as the scan-based build). Supported index-column
    * types: the primitive numerics, strings, and dates the driver testdata
    * uses; anything else → IllegalArgumentException rather than a silently
    * wrong envelope. */
  def buildFromFooters(spark: SparkSession, dir: String, cols: String*): DataFrame = {
    require(cols.nonEmpty, "zone map needs at least one indexed column")
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // ONE relation for both the schema and the listing-id map below: each
    // spark.read.parquet(dir) builds its own InMemoryFileIndex — a full
    // recursive listing, expensive on object stores.
    val table = spark.read.parquet(dir)
    val tableSchema = table.schema
    val fields = cols.map(c => tableSchema.fields.find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(s"no column $c in $dir")))
    def convert(v: AnyRef, dt: org.apache.spark.sql.types.DataType,
                cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Any = dt match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        // INT64 with a TIMESTAMP(isAdjustedToUTC=false) annotation; the
        // annotation carries the writer's unit.
        import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
        val unit = cc.getPrimitiveType.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation => t.getUnit
          case other => throw new IllegalArgumentException(
            s"unexpected annotation $other for TIMESTAMP_NTZ")
        }
        val raw = v.asInstanceOf[java.lang.Long].longValue
        val us = unit match {
          case TimeUnit.MILLIS => raw * 1000L
          case TimeUnit.MICROS => raw
          case TimeUnit.NANOS  => Math.floorDiv(raw, 1000L)
        }
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case org.apache.spark.sql.types.LongType => v.asInstanceOf[java.lang.Long].longValue
      case org.apache.spark.sql.types.IntegerType => v.asInstanceOf[java.lang.Integer].intValue
      case org.apache.spark.sql.types.DoubleType => v.asInstanceOf[java.lang.Double].doubleValue
      case org.apache.spark.sql.types.FloatType => v.asInstanceOf[java.lang.Float].floatValue
      case org.apache.spark.sql.types.StringType =>
        v.asInstanceOf[Binary].toStringUsingUTF8
      case org.apache.spark.sql.types.DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue))
      case other => throw new IllegalArgumentException(
        s"zone-map footer build does not support $other")
    }
    @annotation.nowarn("cat=deprecation")
    def footerRow(status: org.apache.hadoop.fs.FileStatus): Option[Row] = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(status, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        val rows = blocks.map(_.getRowCount).sum
        // MISSING statistics are not an all-null envelope: a writer may have
        // suppressed stats (disabled, legacy parquet-mr string stats,
        // oversized binary min/max), and indexing such a file with a null
        // envelope would let ruledOutFiles positively prune a file that has
        // data — lost rows. A chunk either contributes real min/max, is
        // PROVABLY all-null (numNulls recorded and equal to the chunk's
        // rows), or poisons the file: unindexable files are left out of the
        // index entirely, and unindexed files are always scanned.
        var indexable = true
        val perCol = fields.map { f =>
          var lo: Any = null
          var hi: Any = null
          for (b <- blocks; cc <- b.getColumns.asScala
               if cc.getPath.toDotString == f.name) {
            val st = cc.getStatistics
            val allNull = st != null && st.isNumNullsSet &&
              st.getNumNulls == b.getRowCount
            if (st == null || (!st.hasNonNullValue && !allNull)) indexable = false
            else if (st.hasNonNullValue) {
              val mn = convert(st.genericGetMin.asInstanceOf[AnyRef], f.dataType, cc)
              val mx = convert(st.genericGetMax.asInstanceOf[AnyRef], f.dataType, cc)
              val ord = f.dataType match {
                case org.apache.spark.sql.types.StringType =>
                  // Unsigned UTF-8 byte order — the order parquet footer
                  // stats and Spark's string comparisons both use.
                  // java.lang.String compares UTF-16 code units, which
                  // disagrees for supplementary characters (surrogate pairs
                  // sort below U+E000 in UTF-16, above it in UTF-8); a
                  // wrong fold order could shrink the envelope and let
                  // ruledOutFiles prune a file that holds matching rows.
                  Ordering.fromLessThan[Any]((a, b) =>
                    org.apache.spark.unsafe.types.UTF8String
                      .fromString(a.asInstanceOf[String])
                      .compareTo(org.apache.spark.unsafe.types.UTF8String
                        .fromString(b.asInstanceOf[String])) < 0)
                case org.apache.spark.sql.types.DateType =>
                  Ordering.by[Any, Long](_.asInstanceOf[java.sql.Date].getTime)
                case org.apache.spark.sql.types.TimestampNTZType =>
                  Ordering.by[Any, java.time.LocalDateTime](
                    _.asInstanceOf[java.time.LocalDateTime])(
                    Ordering.fromLessThan(_ isBefore _))
                // Integral types fold in EXACT Long order: a Double fold
                // collapses values that differ below 2^-53 relative (two
                // ts_ns-scale longs 512 apart convert to the SAME double),
                // which can shrink the envelope and positively prune a file
                // that holds matching rows — lost rows, the one failure
                // this module's contract forbids.
                case org.apache.spark.sql.types.LongType |
                     org.apache.spark.sql.types.IntegerType =>
                  Ordering.by[Any, Long](_.asInstanceOf[Number].longValue)
                case _ => Ordering.by[Any, Double](x =>
                  x.asInstanceOf[Number].doubleValue)
              }
              if (lo == null || ord.lt(mn, lo)) lo = mn
              if (hi == null || ord.gt(mx, hi)) hi = mx
            }
          }
          (lo, hi)
        }
        if (!indexable) None
        else Some(Row.fromSeq(status.getPath.toString +: rows +:
          perCol.flatMap { case (lo, hi) => Seq(lo, hi) }))
      } finally reader.close()
    }
    // Rewrite file ids into the exact strings the scan's listing produces
    // (URI scheme rendering differs between Hadoop Path and Spark's
    // listing), so prunedRead's set subtraction matches; a file the listing
    // doesn't know stays as-is and is simply never subtracted — the safe
    // direction.
    val listingById = table.inputFiles
      .map(s => new java.net.URI(s).getPath -> s).toMap
    // RECURSIVE listing, matching the scan-based build(): Spark's own
    // parquet read descends into nested/partitioned layouts, so a
    // top-level-only listStatus here would silently omit every nested
    // part file from the footer index — the two builds are documented
    // interchangeable, and an index missing files never prunes them
    // (safe, but the promised skipping degrades to full scans).
    val fileStatuses = {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    }
    val rows = fileStatuses
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .flatMap(footerRow)
      .map(r => Row.fromSeq(
        listingById.getOrElse(new java.net.URI(r.getString(0)).getPath,
          r.getString(0)) +: r.toSeq.tail))
      .toSeq
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rows",
          org.apache.spark.sql.types.LongType)) ++
      fields.flatMap(f => Seq(
        org.apache.spark.sql.types.StructField(s"min_${f.name}", f.dataType),
        org.apache.spark.sql.types.StructField(s"max_${f.name}", f.dataType))))
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), schema)
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
      // basePath: an explicit file list otherwise loses directory-derived
      // partition columns on the nested/partitioned layouts buildFromFooters
      // supports, changing the pruned frame's schema vs the full-table read.
      } else spark.read.option("basePath", dir).parquet(files: _*).filter(predicate)
    Pruned(df, files.length, current.length)
  }

  /** A pruned scan and how much the zone map skipped to produce it. */
  final case class Pruned(df: DataFrame, selectedFiles: Int, totalFiles: Int)
}
