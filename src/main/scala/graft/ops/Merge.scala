package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyed upsert / merge — the reference's central warehouse semantic
  * (SURVEY.md §2 K4): `INSERT ... ON CONFLICT (key...) DO UPDATE SET ...`
  * (`scripts/lambda_handler_warehouse.py:95-101`), i.e. last-write-wins on a
  * natural key, idempotent under re-delivery.
  *
  * Two physical strategies, both shuffle-frugal:
  *  - [[upsert]]: anti-join + union. When `updates` is small (the common
  *    incremental-load case) the anti-join broadcasts the update keys, so the
  *    100 TB target side is never shuffled — this is the scale path.
  *  - [[upsertVersioned]]: window dedup over a union, for merging many
  *    batches in one pass with an explicit priority (file ordinal in the
  *    reference's sequential loop, `scripts/lambda_handler_warehouse.py:79`).
  *    One shuffle on the merge keys.
  */
object Merge {

  /** Last-write-wins merge of `updates` into `target` on `keys`.
    * Requires `updates` unique on `keys` (enforce upstream with
    * [[latestPerKey]] if needed). Schema of both sides must match.
    *
    * Null keys: SQL join semantics — a null key never matches, so null-key
    * rows on both sides are retained side-by-side. This mirrors the
    * reference warehouse, where the Postgres UNIQUE constraint treats NULLs
    * as distinct (`scripts/lambda_handler_warehouse.py:63`); the reference
    * additionally drops null-key rows upstream (P2), as does our pipeline. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(updates(_))
    val updateKeys = updates.select(keyCols: _*)
    // Broadcast the update-key set only when the optimizer's own size
    // estimate says it fits the session broadcast threshold — a forced hint
    // would OOM the driver on a large batch (e.g. an initial full load)
    // regardless of autoBroadcastJoinThreshold. Unknown/huge stats fall back
    // to a shuffle anti-join, which AQE can still convert at runtime.
    val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    val probe =
      if (threshold > 0 &&
          updateKeys.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold)
        broadcast(updateKeys)
      else updateKeys
    target.join(probe, keys, "left_anti")
      // using-column joins hoist the keys to the front; restore the
      // target's column order so merge is schema-stable.
      .select(target.columns.toIndexedSeq.map(col): _*)
      .unionByName(updates)
  }

  /** Merge a union of versioned rows: highest `versionCol` wins per key;
    * ties broken deterministically by the remaining sort expressions. */
  def upsertVersioned(all: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    all.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn", versionCol)
  }

  /** Keep the winning row per key ordered by `orderCols` descending —
    * building block for making update batches key-unique. */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }
}
