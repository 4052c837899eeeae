package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Data-layout control for scan-time skipping: range-partition + sort by the
  * dominant filter column before writing, so every file (and every parquet
  * row group inside it) covers a disjoint range. A time-filtered scan then
  * prunes whole files from the min/max statistics instead of reading 100 TB
  * to discard most of it.
  */
object Layout {

  /** Write `df` range-clustered on `sortCols` into `nFiles` parquet files:
    * file-level ranges are disjoint, rows inside each file sorted. */
  def sortedWrite(df: DataFrame, dir: String, nFiles: Int, sortCols: String*): Unit =
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Z-order (Morton-curve) clustering on TWO numeric columns: each column
    * is min-max scaled to 32 bits, interleaved by the native
    * [[graft.functions.NativeKernels.mortonInterleave]] kernel, and the data
    * range-partitioned + sorted on the z-value. Unlike [[sortedWrite]] —
    * which gives one column disjoint file ranges and leaves the other
    * spanning everything — every file then covers a COMPACT range of both
    * columns, so filters on either prune files from parquet min/max stats.
    * The min/max pre-pass is two scalar aggregates (one scan), the same
    * price every z-order implementation pays. */
  def zorderWrite(df: DataFrame, dir: String, nFiles: Int,
                  colA: String, colB: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.NumericType
    for (c <- Seq(colA, colB))
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"zorderWrite cluster column '$c' must be numeric, " +
          s"got ${df.schema(c).dataType.simpleString}")
    val b = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).collect().head
    // Empty input: min/max aggregate to null, and getDouble would NPE —
    // the sortedWrite twin handles empty frames, so a relayout pass over a
    // possibly-empty partition directory must too. Any bounds work for
    // zero rows; write the empty table and return.
    if (b.isNullAt(0)) {
      df.write.mode(SaveMode.Overwrite).parquet(dir)
      return
    }
    val (loA, hiA, loB, hiB) = (b.getDouble(0), b.getDouble(1),
      b.getDouble(2), b.getDouble(3))
    def scaled(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      ((col(c).cast("double") - lit(lo)) / lit(span) * lit(4294967295.0))
        .cast("long")
    }
    val z = graft.functions.NativeKernels.mortonInterleave(
      scaled(colA, loA, hiA), scaled(colB, loB, hiB))
    df.withColumn("__graft_z", z)
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }
}
