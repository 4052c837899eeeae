package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for q185 (not part of the contract). */
object Q185Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warmup table read
    graft.sources.Tables.documents(spark, dir).count()
    for (_ <- 1 to 2) {
      val spans = t("spans+ckpt") {
        graft.ext.Dedup.sourceSpans(spark, dir, 8).localCheckpoint()
      }
      println("[probe] span rows " + spans.count())
      val comps = t("comps+ckpt") {
        spans
          .select($"source", explode(sequence(lit(0), lit(63))).as("j"), $"h")
          .select($"source", $"j",
            conv(substring(md5(concat($"j", lit("_"), $"h")), 1, 8), 16, 10)
              .cast("long").as("v"))
          .groupBy($"source", $"j").agg(min($"v").as("mv"))
          .localCheckpoint()
      }
      val est = comps.as("a")
        .join(comps.as("b"), $"a.j" === $"b.j" && $"a.source" < $"b.source")
        .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
        .agg(sum(when($"a.mv" === $"b.mv", 1L).otherwise(0L)).as("matches"))
      t("est collect")(est.collect())
      t("exact overlap") {
        graft.ext.Dedup.overlapFromSpans(spans).collect()
      }
    }
    spark.stop()
  }
}
