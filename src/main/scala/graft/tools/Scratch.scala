package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway probe (not committed): planted-pair simhash hammings. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("scratch", "8")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val corpus = graft.ext.Dedup.withPlantedNear(
        graft.sources.Tables.documents(spark, dir), 20).select($"doc_id", $"text")
      val sh = corpus
        .withColumn("th", transform(split($"text", "\\s+"), t => xxhash64(t)))
        .select($"doc_id", graft.ext.Dedup.simhashFromHashes($"th").as("sh"))
      val planted = sh.filter($"doc_id" < 20)
        .join(sh.select(($"doc_id" - graft.ext.Dedup.NearDupIdOffset).as("doc_id"),
          $"sh".as("sh2")), "doc_id")
        .select($"doc_id", bit_count($"sh".bitwiseXOR($"sh2")).as("hamming"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      println(s"HAMMING $dir " + planted.map(_._2).mkString(","))
    }
    spark.stop()
  }
}
