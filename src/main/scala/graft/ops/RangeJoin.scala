package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join without a nested loop — the scale path for range
  * joins where BOTH sides are large (the broadcast non-equi form, q18, is
  * right only while one side fits a broadcast).
  *
  * Each interval explodes into the grid cells of width `step` it covers; a
  * point belongs to exactly one cell; the join becomes a hash equi-join on
  * the cell id with the exact range predicate re-applied as a residual
  * filter. Cost: |intervals| × (span/step) exploded rows and ONE shuffle of
  * each side on the cell key — no O(n·m) comparison anywhere. Choose `step`
  * near the typical interval span so each interval covers O(1) cells.
  *
  * A point matches an interval through exactly one cell (the point's own),
  * so no post-join dedup is needed.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      step: Double): DataFrame = {
    require(step > 0, "step must be positive")
    val cells = intervals.withColumn("__graft_cell",
      explode(sequence(
        floor(col(loCol).cast("double") / step).cast("long"),
        floor(col(hiCol).cast("double") / step).cast("long"))))
    points
      .withColumn("__graft_cell",
        floor(col(pointCol).cast("double") / step).cast("long"))
      .join(cells, "__graft_cell")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__graft_cell")
  }

  /** Interval-overlap join (temporal join): pairs where
    * `lLo < rHi && rLo < lHi` (half-open overlap), again as a cell
    * equi-join. Overlapping pairs share MANY cells, so a naive cell join
    * would duplicate them; instead each surviving pair is counted only in
    * the cell containing `max(lLo, rLo)` — the first cell where both
    * intervals are present — which every overlapping pair hits exactly
    * once. Dedup-free: no distinct over the (possibly wide) output. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      step: Double): DataFrame = {
    require(step > 0, "step must be positive")
    def cellsOf(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__graft_cell",
        explode(sequence(
          floor(col(lo).cast("double") / step).cast("long"),
          floor(col(hi).cast("double") / step).cast("long"))))
    cellsOf(left, lLo, lHi)
      .join(cellsOf(right, rLo, rHi), "__graft_cell")
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col("__graft_cell") ===
        floor(greatest(col(lLo), col(rLo)).cast("double") / step).cast("long"))
      .drop("__graft_cell")
  }
}
