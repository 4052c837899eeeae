package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Attribute the per-task fixed cost: run named SparkEntry queries (warmup +
  * N reps) and print, per rep, the SUM across tasks of every TaskMetrics
  * time bucket — run/CPU/deserialize(+CPU)/GC/result-ser/fetch-wait/shuffle-
  * write — plus task+stage counts and the JVM-wide codegen-compilation
  * delta (count + ms, from CodegenMetrics). Separates "tasks re-deserialize
  * a megabyte plan" from "codegen recompiles per rep" from "real compute".
  * Usage: runMain graft.tools.TaskProfile <sfDir> <reps> <query...>
  */
object TaskProfile {
  private final class L extends SparkListener {
    val run, cpu, deser, deserCpu, gc, resSer, fetchWait, shufWrite, tasks, stages = new AtomicLong()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        run.addAndGet(m.executorRunTime)
        cpu.addAndGet(m.executorCpuTime)
        deser.addAndGet(m.executorDeserializeTime)
        deserCpu.addAndGet(m.executorDeserializeCpuTime)
        gc.addAndGet(m.jvmGCTime)
        resSer.addAndGet(m.resultSerializationTime)
        fetchWait.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
        shufWrite.addAndGet(m.shuffleWriteMetrics.writeTime)
        tasks.incrementAndGet()
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    def snap(): Seq[Long] = Seq(run.get, cpu.get, deser.get, deserCpu.get,
      gc.get, resSer.get, fetchWait.get, shufWrite.get, tasks.get, stages.get)
  }

  private def codegen(): (Long, Double) = {
    val h = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    (h.getCount, h.getSnapshot.getValues.sum.toDouble)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.withStatics(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.muteBenignWarns()
    val l = new L
    spark.sparkContext.addSparkListener(l)
    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    // Listener settling: require 3 CONSECUTIVE unchanged 20 ms samples (one
    // unchanged sample can be a gap between async event deliveries, leaking
    // late task-end events into the next rep's delta), and give the loop a
    // 50-sample budget instead of 10 before giving up on a busy bus.
    def settled(): Seq[Long] = {
      var prev = l.snap(); var same = 0; var spins = 0
      while (same < 3 && spins < 50) {
        Thread.sleep(20)
        val cur = l.snap()
        if (cur == prev) same += 1 else { same = 0; prev = cur }
        spins += 1
      }
      prev
    }
    for (name <- names) {
      try run(name) catch { case e: Throwable => println(s"$name warmup: ${e.getMessage}") }
      println(s"== $name")
      for (rep <- 1 to reps) {
        val s0 = settled(); val (cg0, cgm0) = codegen()
        val t0 = System.nanoTime()
        run(name)
        val wall = (System.nanoTime() - t0) / 1e9
        val s1 = settled(); val (cg1, cgm1) = codegen()
        val d = s1.zip(s0).map { case (a, b) => a - b }
        println(f"rep$rep wall $wall%6.2f  run ${d(0) / 1e3}%7.2f cpu ${d(1) / 1e6 / 1e3}%7.2f " +
          f"deser ${d(2) / 1e3}%6.2f deserCpu ${d(3) / 1e6 / 1e3}%6.2f gc ${d(4) / 1e3}%5.2f " +
          f"resSer ${d(5) / 1e3}%5.2f fetch ${d(6) / 1e3}%5.2f shufW ${d(7) / 1e6 / 1e3}%5.2f " +
          f"tasks ${d(8)}%4d stages ${d(9)}%3d cgN ${cg1 - cg0}%3d cgMs ${cgm1 - cgm0}%6.0f")
      }
    }
    spark.stop()
  }
}
