package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Scaling-linearity probe: replicate the sf0.1 fact tables 8× (key-offset
  * so join cardinalities scale honestly), run headline queries on both, and
  * report the time ratio. A shuffle- or driver-bound operator shows a ratio
  * well above the data ratio; a scan-bound one tracks it.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scale-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val base = "/root/testdata/sf0.1"
    val big = java.nio.file.Files.createTempDirectory("graft_sf08_").toString
    val replicas = 8

    // Replicate lineitem+orders with orderkey offsets; copy dims as-is.
    val OffsetStep = 100000000L
    val li = Tables.lineitem(spark, base)
    val o = Tables.orders(spark, base)
    (0 until replicas).map(r => li.withColumn("l_orderkey", $"l_orderkey" + r * OffsetStep))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/lineitem.parquet")
    (0 until replicas).map(r => o.withColumn("o_orderkey", $"o_orderkey" + r * OffsetStep))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/orders.parquet")
    // Only the tables the headline queries touch (events carries ns
    // timestamps a raw copy can't round-trip).
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      Tables.load(spark, base, t).write.mode("overwrite").parquet(s"$big/$t.parquet")
    // documents: replicate with doc_id offsets (keeps planted-dup ids intact
    // for replica 0 only; the other replicas add corpus bulk)
    val docs = Tables.documents(spark, base)
    (0 until replicas).map(r => docs.withColumn("doc_id", $"doc_id" + r * OffsetStep))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")

    val headline = Seq("q01_pricing_summary", "q10_revenue_by_nation",
      "q12_running_totals", "q07_upsert", "q11_top_customers_per_region",
      "q34_minhash_neardup", "q30_text_stats", "q52_bpe_token_estimate")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    headline.foreach(q => time(q, base)) // warmup
    println(f"${"query"}%-30s ${"sf0.1"}%8s ${"8x"}%8s  ratio (data 8x)")
    headline.foreach { q =>
      val t1 = time(q, base)
      val t8 = time(q, big)
      println(f"$q%-30s $t1%8.2f $t8%8.2f  ${t8 / t1}%.1fx")
    }
    spark.stop()
  }
}
