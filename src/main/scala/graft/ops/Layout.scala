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
}
