package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost pipeline metrics via `Dataset.observe` (CollectMetrics):
  * data-quality counters accumulated DURING a real query's execution —
  * no second scan. Where q70 is the standalone audit report, this is how a
  * production pipeline watches the same signals for free: at 100 TB an
  * extra validation pass over the input is a job you cannot afford, while
  * observe() rides the scan the query already pays for.
  */
object Observed {

  /** Attach the q70-style quality counters to a lineitem-shaped frame.
    * Returns the instrumented frame (plans identically — CollectMetrics is
    * transparent to the optimizer) and the [[Observation]] whose `get`
    * yields the counters once any action on the frame completes. */
  def withQualityMetrics(df: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("null_quantity"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1).otherwise(0))
        .as("bad_discount"),
      sum(when(col("l_extendedprice") <= 0, 1).otherwise(0))
        .as("nonpositive_price"))
    (observed, obs)
  }
}
