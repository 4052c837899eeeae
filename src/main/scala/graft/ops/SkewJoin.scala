package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md "Optimize for scale": skewed
  * keys → salting or AQE skew-join). AQE's skew handling (enabled in
  * GraftSession) splits oversized partitions after a sort-merge join; this
  * operator is the explicit form for the hash-join / pre-aggregation cases
  * AQE can't rewrite — e.g. a hot user_id owning 10% of a 100 TB fact table.
  *
  * The fact side gets a deterministic salt derived from its own row content
  * (never `rand()` — task retries must produce identical salts or shuffle
  * files disagree); the dimension side is replicated `saltFactor` times.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int, factSaltCols: Seq[String]): DataFrame = {
    // saltFactor=0 would make pmod(..., 0) evaluate to null (non-ANSI) and
    // the equi-join on the null salt match NOTHING — an empty result with
    // no error, the silent-wrongness class the sibling ops reject loudly.
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = fact.withColumn("__graft_salt",
      pmod(xxhash64(factSaltCols.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__graft_salt"))
      .drop("__graft_salt")
  }
}
