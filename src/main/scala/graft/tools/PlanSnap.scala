package graft.tools

import org.apache.spark.sql.execution.ExplainMode
import graft.GraftSession

/** Snapshot the formatted physical plan of named SparkEntry queries into
  * per-query files — the before/after evidence trail for optimization
  * rounds (`plans/r<N>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.PlanSnap <outDir> <tag> <query...>
  * (env: SPARK_GRAFT_SF_DIR, default sf0.001 — plan SHAPE is
  * SF-independent for these queries, same contract as ExplainDump).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.build("plan-snap",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    for (name <- names) {
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val f = outDir.resolve(s"${name}_$tag.txt")
      java.nio.file.Files.write(f,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $f")
    }
    spark.stop()
  }
}
