package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main for quick plan/schema checks. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "32")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    // warmup
    graft.sources.Tables.documents(spark, dir).count()
    var t0 = System.nanoTime()
    val hdocs = graft.ext.Dedup.withPlantedNear(graft.sources.Tables.documents(spark, dir), 20)
      .select($"doc_id", graft.ext.Dedup.hashedShingles(
        graft.ext.Dedup.wordShingles($"text", 3)).as("hs"))
      .persist()
    println("hdocs: " + hdocs.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val sigs = hdocs.select($"doc_id", graft.ext.Dedup.minhashSignature($"hs").as("sig"))
    println("sigs: " + sigs.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val pairs = graft.ext.Dedup.candidatePairs(graft.ext.Dedup.lshBands(sigs))
    println("pairs: " + pairs.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val out = graft.ext.Dedup.q34MinhashNearDup(spark, dir)
    println("full q34: " + out.count() + " in " + (System.nanoTime()-t0)/1e9)
    spark.stop()
  }
}
