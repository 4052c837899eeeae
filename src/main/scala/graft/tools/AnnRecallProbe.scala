package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ext.{IvfPq, Pq, Similarity}

/** Print each ANN method's realized recall@5 vs the exact brute force at a
  * given SF dir — the margin audit behind q149's floors (since round 16:
  * ivf 0.35, ivfpq 0.45, lsh 0.4, pq 0.8 — measured-minus-margin, ~10–25%
  * under the realized minimum at both oracle SFs, so a genuine recall
  * regression fails the oracle while regeneration jitter does not). Run
  * after any fixture regeneration and RE-DERIVE the floors from what this
  * prints — a floor within ~10% of realized deserves a second look.
  *
  * `runMain graft.tools.AnnRecallProbe [sfDir...]` (default sf0.001+sf0.01).
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("ann-recall-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (dir <- dirs) {
      val exact = Similarity.q37TopKBruteForce(spark, dir)
        .select(col("query_id"), col("neighbor_id")).cache()
      val total = exact.count()
      def recall(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
        val hits = exact.join(
          broadcast(ann.select(col("query_id"), col("neighbor_id"))),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        println(f"[recall] $dir $name%-6s ${hits.toDouble / total}%.3f ($hits/$total)")
      }
      recall("lsh", Similarity.q38AnnLsh(spark, dir))
      recall("ivf", Similarity.q42AnnIvf(spark, dir))
      recall("pq", Pq.q98AnnPq(spark, dir))
      recall("ivfpq", IvfPq.q99AnnIvfPq(spark, dir))
      exact.unpersist()
    }
    spark.stop()
  }
}
