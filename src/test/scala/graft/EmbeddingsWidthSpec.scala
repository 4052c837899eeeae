package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.sources.Tables

/** Fixture-regeneration immunity for the embeddings table (the events `ts`
  * analog, VERDICT r09 #3 discipline): if the driver ever regenerates
  * `embeddings.parquet` with `array<double>` elements, the float-reading
  * native kernels (`NormalizeL2F`, the LSH signature expressions) would
  * mis-read raw slots — so `Tables.embeddings` pins the element type to
  * `array<float>` at the scan boundary. This spec builds that future
  * fixture (the sf0.001 embeddings widened to double) and drives it through
  * the kernel-bearing paths, requiring exact agreement with the float
  * original. */
class EmbeddingsWidthSpec extends SparkSpec {

  private lazy val wideDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_emb_wide_").toString
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("a double[] fixture loads back as array<float>") {
    import org.apache.spark.sql.types._
    val et = Tables.embeddings(spark, wideDir).schema("embedding").dataType
    assert(et == ArrayType(FloatType, containsNull = true) ||
      et == ArrayType(FloatType, containsNull = false), s"got $et")
  }

  test("brute-force cosine top-k is identical on the widened fixture") {
    val a = Similarity.q37TopKBruteForce(spark, sf0001).collect().toSeq
    val b = Similarity.q37TopKBruteForce(spark, wideDir).collect().toSeq
    assert(a == b)
  }

  test("LSH ANN (getFloat signature kernel) is identical on the widened fixture") {
    val a = Similarity.q38AnnLsh(spark, sf0001).collect().toSeq
    val b = Similarity.q38AnnLsh(spark, wideDir).collect().toSeq
    assert(a == b)
  }

  test("raw double[] into the LSH expression implicit-casts instead of mis-reading") {
    // Bypass the loader: feed array<double> straight to the expression. The
    // ImplicitCastInputTypes pin must insert the narrowing cast at analysis
    // so the getFloat kernel sees real floats.
    def sigs(path: String) = spark.read.parquet(path)
      .select(col("vec_id"), Similarity.lshSignatures(col("embedding")).as("s"))
      .orderBy("vec_id").collect().toSeq
    assert(sigs(s"$sf0001/embeddings.parquet") == sigs(s"$wideDir/embeddings.parquet"))
  }

  test("L2 normalization (getFloat kernel) is identical on the widened fixture") {
    def norms(dir: String) = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.normalizeArr(col("embedding")).as("n"))
      .orderBy("vec_id").collect().toSeq
    assert(norms(sf0001) == norms(wideDir))
  }
}
