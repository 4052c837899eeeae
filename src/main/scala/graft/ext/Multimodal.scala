package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, batch "decode" / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[fakeDecode]]) — the Spark-side
  * contract (schema, binary handling, partitioned batch shape, explode-based
  * frame sampling) is real and tested. Swap [[fakeDecode]] for a JNI/codec
  * call and nothing else changes.
  */
object Multimodal {

  /** Synthesize a media table from documents: payload = UTF-8 bytes of the
    * text (a stand-in blob), kind cycled per row, plus metadata. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id".as("media_id"),
      encode($"text", "UTF-8").as("payload"),
      element_at(typedLit(Seq("image", "audio", "video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      $"source")
  }

  /** STUB decode: deterministic pseudo-metadata derived from the payload
    * bytes. A real implementation would decode the codec here; everything
    * downstream (schema, partitioning, explode) is production-shaped. */
  def fakeDecode(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df
      .withColumn("n_bytes", octet_length($"payload"))
      .withColumn("width", ($"n_bytes" % 640 + 16).cast("int"))
      .withColumn("height", ($"n_bytes" % 480 + 16).cast("int"))
      .withColumn("n_frames",
        when($"kind" === "video", ($"n_bytes" % 24 + 1).cast("int"))
          .otherwise(lit(1)))
  }

  /** Decoded metadata per media row — binary in, typed features out. */
  def q40MediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fakeDecode(mediaTable(spark, dir))
      .select($"media_id", $"kind", $"n_bytes", $"width", $"height", $"n_frames")
      .orderBy($"media_id")
  }

  /** Frame sampling: one row per sampled frame index (stride 4) — the
    * explode-shaped stage a video pipeline runs before per-frame featurize.
    * Partitioned by media_id bucket upstream so decode parallelism is even. */
  def q41FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fakeDecode(mediaTable(spark, dir))
      .filter($"kind" === "video")
      .repartition(col("media_id"))
      .select($"media_id", $"n_frames",
        posexplode(sequence(lit(0), $"n_frames" - 1, lit(4))).as(Seq("sample_idx", "frame_idx")))
      .select($"media_id", $"sample_idx", $"frame_idx")
      .orderBy($"media_id", $"sample_idx")
  }
}
