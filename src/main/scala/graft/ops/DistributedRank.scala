package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank / running total over a STRICT total order — the
  * scale-safe replacement for `Window.orderBy(...)` with no partition spec,
  * which serializes the whole table through one task (`WindowExec: No
  * Partition Defined`).
  *
  * Two-pass shape (the classic zipWithIndex decomposition):
  *   1. `repartitionByRange` on the sort key — the range partitioner's
  *      sampled bounds put every partition's rows strictly before the
  *      next's, so a GLOBAL position is a LOCAL position plus the sizes of
  *      the partitions before it.
  *   2. A per-partition window (partitioned by `spark_partition_id()`,
  *      ~N/parts rows each, fully parallel) computes local positions; the
  *      per-partition counts/sums — one row per partition — cumsum into
  *      offsets on the driver side of a broadcast join.
  *
  * Exactness requires the sort key to be a strict total order (include a
  * unique tiebreaker): then global row_number is unique regardless of where
  * the sampled partition bounds fall, and rank-derived statistics (ntile,
  * percent_rank) are pure functions of (row_number, N) — computed here
  * without any single-partition pass over data. The only remaining
  * single-partition window runs over the per-partition count frame
  * (≤ `parts` rows — the broadcast cumsum, same bounded class as the other
  * accepted aggregate-input windows).
  *
  * At 100 TB: one range shuffle + one hash shuffle of the data, a ~32-row
  * offsets frame, and no task ever holds more than one partition — vs the
  * single-task total sort this replaces.
  */
object DistributedRank {

  private val PidCol = "_graft_pid"
  private val LocalCol = "_graft_local"
  private val OffCol = "_graft_off"
  private val CntCol = "_graft_cnt"

  private def parts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** `df` plus `out` = global 1-based row_number under `sortCols` (must be
    * a strict total order) and `totalOut` = the total row count N (the pair
    * every rank statistic derives from). */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
                    out: String, totalOut: String): DataFrame = {
    val n = parts(df)
    val withPid = df.repartitionByRange(n, sortCols: _*)
      .withColumn(PidCol, spark_partition_id())
    val wLocal = Window.partitionBy(col(PidCol)).orderBy(sortCols: _*)
    val local = withPid.withColumn(LocalCol, row_number().over(wLocal))
    // One row per partition; the exclusive cumsum and the grand total are
    // single-partition passes over ≤ `parts` rows, then broadcast back.
    val counts = withPid.groupBy(col(PidCol)).agg(count(lit(1)).as(CntCol))
    val wOff = Window.orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = counts
      .withColumn(OffCol, coalesce(sum(col(CntCol)).over(wOff), lit(0L)))
      .withColumn(totalOut, sum(col(CntCol)).over(wTot))
      .select(col(PidCol), col(OffCol), col(totalOut))
    local.join(broadcast(offs), PidCol)
      .withColumn(out, col(OffCol) + col(LocalCol))
      .drop(PidCol, LocalCol, OffCol)
  }

  /** `df` plus `out` = global EXCLUSIVE running sum of `value` under
    * `sortCols` (strict total order): the sum over all strictly-preceding
    * rows, 0 for the first. */
  def withRunningSum(df: DataFrame, sortCols: Seq[Column], value: Column,
                     out: String): DataFrame = {
    val n = parts(df)
    val valCol = "_graft_val"
    val withPid = df.withColumn(valCol, value)
      .repartitionByRange(n, sortCols: _*)
      .withColumn(PidCol, spark_partition_id())
    val wLocal = Window.partitionBy(col(PidCol)).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withPid.withColumn(LocalCol,
      coalesce(sum(col(valCol)).over(wLocal), lit(0L)))
    val totals = withPid.groupBy(col(PidCol)).agg(sum(col(valCol)).as(CntCol))
    val wOff = Window.orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = totals
      .withColumn(OffCol, coalesce(sum(col(CntCol)).over(wOff), lit(0L)))
      .select(col(PidCol), col(OffCol))
    local.join(broadcast(offs), PidCol)
      .withColumn(out, col(OffCol) + col(LocalCol))
      .drop(PidCol, LocalCol, OffCol, valCol)
  }

  /** SQL-standard NTILE from (row_number, N): the first `n mod k` buckets
    * take `⌈n/k⌉` rows, the rest `⌊n/k⌋` — identical to Spark's and
    * DuckDB's window NTILE over the same total order. */
  def ntileOf(rn: Column, total: Column, k: Int): Column = {
    // NB: Column./ is FLOATING division even on integral inputs — every
    // quotient here must floor, or a fractional base bucket size shifts
    // each boundary row down one bucket.
    val base = floor(total.cast("long") / k).cast("long") // floor bucket size
    val rem = total.cast("long") % k // first `rem` buckets get one more
    val bigSpan = rem * (base + 1) // rows covered by the bigger buckets
    when(rn <= bigSpan, floor((rn - 1) / (base + 1)).cast("long") + 1)
      .otherwise(rem + floor((rn - 1 - bigSpan) / base).cast("long") + 1)
      .cast("int")
  }

  /** SQL-standard percent_rank from (row_number, N) under a STRICT total
    * order (no full-key ties, so rank = row_number): (rn − 1)/(N − 1). */
  def percentRankOf(rn: Column, total: Column): Column =
    when(total === 1L, lit(0.0))
      .otherwise((rn - 1).cast("double") / (total - 1).cast("double"))
}
