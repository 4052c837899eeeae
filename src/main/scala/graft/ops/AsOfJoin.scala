package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join: attach to each left row the most recent right
  * row with `rightTime <= leftTime` within the same key group.
  *
  * Spark has no built-in as-of join; rather than a custom physical operator
  * we compose it as union + ordered window with `last(_, ignoreNulls)` —
  * a single shuffle on the key, no ordering assumptions between the inputs,
  * fully whole-stage-codegen'd. This scales: state per key group is bounded
  * by the window sort, which Spark spills externally.
  *
  * All carried values are packed into ONE struct before the window, so every
  * output column comes from the same most-recent right row and a genuinely
  * null right value survives (per-column `last(_, ignoreNulls)` would instead
  * reach back to an older row for that column alone).
  *
  * Null semantics (matching [[graft.plans.NativeAsOfJoin]] and SQL
  * comparison): a null `rightTime` never satisfies `rightTime <= leftTime`,
  * so such right rows are dropped; a null `leftTime` matches nothing and
  * yields null `asof_*` values.
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
    // Every by-name reference goes through `c` (backtick-quoted, embedded
    // backticks escaped): a bare col("a.b") parses as a struct path and fails
    // on column names containing dots or other special characters.
    def c(name: String): org.apache.spark.sql.Column =
      col("`" + name.replace("`", "``") + "`")
    val leftCols = left.columns
    // Reserved working names and the derived output names must be absent
    // from the left frame, or the selects below hit ambiguous-reference
    // errors (or worse, silently duplicate output columns).
    for (reserved <- Seq("__graft_side", "__graft_vals") ++ rightVals.map(v => s"asof_$v"))
      require(!leftCols.contains(reserved),
        s"left column name '$reserved' collides with the as-of join's working/output columns")
    val otherLeft = leftCols.filterNot(x => keys.contains(x) || x == timeCol)
    val valsType = StructType(rightVals.map(v =>
      StructField(s"asof_$v", right.schema(v).dataType, nullable = true)))
    val tagged =
      left.withColumn("__graft_side", lit(1))
        .select(keys.map(c) ++ Seq(c(timeCol), col("__graft_side"),
          lit(null).cast(valsType).as("__graft_vals")) ++
          otherLeft.map(c): _*)
    // Null keys never match in SQL join semantics (`ON l.k = r.k` is
    // UNKNOWN for null), but a window PARTITION BY groups nulls together —
    // so without this filter a null-key left row would pick up values from
    // null-key right rows. Dropping null-key right rows leaves the null
    // partition with no lookup side: left rows keep their outer-join
    // presence with null asof_* values, exactly the SQL/DuckDB-ASOF result.
    val rightKeysNotNull = keys.map(c(_).isNotNull).reduceOption(_ && _)
      .getOrElse(lit(true))
    val rightTagged =
      right.filter(c(timeCol).isNotNull && rightKeysNotNull)
        .withColumn("__graft_side", lit(0))
        .select(keys.map(c) ++ Seq(c(timeCol), col("__graft_side"),
          struct(rightVals.map(v => c(v).as(s"asof_$v")): _*)
            .cast(valsType).as("__graft_vals")) ++
          otherLeft.map(x => lit(null).cast(left.schema(x).dataType).as(x)): _*)
    val w = Window.partitionBy(keys.map(c): _*)
      .orderBy(c(timeCol).asc, col("__graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.unionByName(rightTagged)
      .withColumn("__graft_vals", last(col("__graft_vals"), ignoreNulls = true).over(w))
      .filter(col("__graft_side") === 1)
      .select(keys.map(c) ++ Seq(c(timeCol)) ++
        rightVals.map(v => col("__graft_vals").getField(s"asof_$v").as(s"asof_$v")) ++
        otherLeft.map(c): _*)
  }
}
