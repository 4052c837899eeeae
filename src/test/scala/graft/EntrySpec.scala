package graft

/** The driver calls `SparkEntry.entry` with ITS OWN session (no graft
  * configs, no registered functions) — it must work on a vanilla session
  * state. `newSession()` gives exactly that: fresh SQL conf, empty temp
  * catalog, no temp functions. */
class EntrySpec extends SparkSpec {

  test("entry runs on a vanilla session and returns rows") {
    val vanilla = spark.newSession()
    val df = SparkEntry.entry(vanilla)
    assert(df.count() > 0)
  }

  test("every query has either an oracle or is a documented rows-only op") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // hash-based / approximate ops legitimately have no SQL oracle
    // q34/q39 graduated to oracle-checked in round 6 (windowed quadratic
    // scan / full-corpus cosine scan).
    // q62 graduated in round 6 too: recursive-CTE closure over the
    // quadratic pair set reproduces the dedup summary in DuckDB.
    assert(noOracle == Set("q21_approx_distinct", "q33_fingerprint",
      "q35_simhash_neardup", "q38_ann_lsh",
      "q42_ann_ivf",
      "q83_heavy_hitters", "q98_ann_pq", "q99_ann_ivfpq",
      "q105_approx_percentiles", "q118_sketch_rollup",
      "q138_rolling_wau_sketch"))
    // and every oracle key must have a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
