package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: attach to each left row the most recent right
  * row with `rightTime <= leftTime` within the same key group.
  *
  * Spark has no built-in as-of join; rather than a custom physical operator
  * we compose it as union + ordered window with `last(_, ignoreNulls)` —
  * a single shuffle on the key, no ordering assumptions between the inputs,
  * fully whole-stage-codegen'd. This scales: state per key group is bounded
  * by the window sort, which Spark spills externally.
  *
  * Ties (right row at exactly leftTime) count as "at or before" — right rows
  * sort before left rows at equal time via the side tag.
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      lookup rows
    * @param keys       equi-join key columns (present in both)
    * @param timeCol    ordering column name (present in both, any orderable type)
    * @param rightVals  right columns to carry; each appears in the output as
    *                   `asof_<name>` (null when no right row precedes)
    */
  def lookup(left: DataFrame, right: DataFrame, keys: Seq[String],
             timeCol: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val tagged =
      left.withColumn("__graft_side", lit(1))
        .select(keys.map(col) ++ Seq(col(timeCol), col("__graft_side")) ++
          rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(s"asof_$v")) ++
          leftCols.filterNot(c => keys.contains(c) || c == timeCol).map(col): _*)
    val rightTagged =
      right.withColumn("__graft_side", lit(0))
        .select(keys.map(col) ++ Seq(col(timeCol), col("__graft_side")) ++
          rightVals.map(v => col(v).as(s"asof_$v")) ++
          leftCols.filterNot(c => keys.contains(c) || c == timeCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(tagged.unionByName(rightTagged)) { (df, v) =>
      df.withColumn(s"asof_$v", last(col(s"asof_$v"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__graft_side") === 1).drop("__graft_side")
  }
}
