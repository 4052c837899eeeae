package graft.tools

import graft.GraftSession

/** Plan/feature inspection scratchpad (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    try {
      val df = spark.sql(
        """WITH RECURSIVE chain AS (
          |  SELECT c_custkey AS id, c_custkey AS node, 0 AS depth
          |  FROM customer WHERE c_custkey < 100
          |  UNION ALL
          |  SELECT id, CAST(floor(node / 4.0) AS BIGINT) AS node, depth + 1
          |  FROM chain WHERE node > 0
          |)
          |SELECT id, max(depth) AS depth_to_root, count(*) AS path_len
          |FROM chain GROUP BY id ORDER BY id LIMIT 5""".stripMargin)
      println("RECURSIVE-OK " + df.collect().mkString(","))
      df.printSchema()
    } catch { case e: Throwable => println("RECURSIVE-FAIL " + e.getMessage.take(300)) }
    try {
      val df = spark.sql(
        """SELECT n_name, t.c_custkey, t.c_acctbal
          |FROM nation, LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer
          |  WHERE c_nationkey = n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
          |ORDER BY n_name, t.c_acctbal DESC, t.c_custkey LIMIT 5""".stripMargin)
      println("LATERAL-OK " + df.collect().mkString(","))
    } catch { case e: Throwable => println("LATERAL-FAIL " + e.getMessage.take(300)) }
    spark.stop()
  }
}
