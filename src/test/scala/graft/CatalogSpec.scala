package graft

import org.apache.spark.sql.execution.ExplainMode

/** Catalog + bucketing surface (SURVEY.md §1 catalog row, §2 K6): databases,
  * managed tables, and bucketed co-located joins — the zero-shuffle join
  * layout for repeated 100 TB fact⋈fact joins. */
class CatalogSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("CREATE DATABASE IF NOT EXISTS graftdb")
    graft.sources.Tables.orders(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graftdb.orders_b")
    graft.sources.Tables.customer(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graftdb.customer_b")
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graftdb.orders_b")
        .join(spark.table("graftdb.customer_b"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    }
  }
}
