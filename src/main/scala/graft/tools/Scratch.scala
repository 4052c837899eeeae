package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "32")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$name] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd ---")
      val pairs = t("pairs (q34 pipeline)")(
        graft.ext.Dedup.q34MinhashNearDup(spark, dir)
          .select($"left_id", $"right_id").persist())
      t("pairs count")(println("    n_pairs=" + pairs.count()))
      val labels = t("connectedComponents")(
        graft.ext.Dedup.connectedComponents(pairs))
      t("labels count")(println("    n_labeled=" + labels.count()))
      pairs.unpersist()
      t("full q62")(graft.SparkEntry.queries("q62_neardup_corpus")(spark, dir)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
