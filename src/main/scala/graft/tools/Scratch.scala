package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_orderkey", $"l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft_zchk_").toString + "/li"
    graft.ops.Layout.zorderWrite(li, dir, 8, "l_orderkey", "l_partkey")
    // recompute the z-value per row and check monotonicity within each file
    val b = li.agg(min($"l_orderkey").cast("double"), max($"l_orderkey").cast("double"),
      min($"l_partkey").cast("double"), max($"l_partkey").cast("double")).collect().head
    def scaled(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      ((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-300)) * lit(4294967295.0)).cast("long")
    val z = graft.functions.NativeKernels.mortonInterleave(
      scaled($"l_orderkey", b.getDouble(0), b.getDouble(1)),
      scaled($"l_partkey", b.getDouble(2), b.getDouble(3)))
    val viol = spark.read.parquet(dir)
      .select(input_file_name().as("f"), z.as("z"))
      .withColumn("prev", lag($"z", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"f").orderBy(monotonically_increasing_id())))
      .filter($"prev".isNotNull && $"prev" > $"z").count()
    println("ORDER VIOLATIONS: " + viol)
    spark.stop()
  }
}
