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

  /** Typed record for the batch-decode path. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], kind: String)
  case class DecodedMedia(media_id: Long, kind: String, n_bytes: Int,
                          width: Int, height: Int, feature: Array[Float])

  /** Batch decode via `mapPartitions` over a typed Dataset — the Scala
    * analogue of `mapInPandas`: the decoder sees an iterator of records per
    * partition, so a real codec can amortize model/codec init once per
    * partition and process in batches. The decode kernel itself is a STUB
    * (deterministic pseudo-features from payload bytes); schema, partition
    * shape, and batch iteration are production-real.
    *
    * Upstream `repartition(media_id)` spreads decode work evenly — decode is
    * CPU-bound, so partition count should track cores, not input splits. */
  def decodeBatched(media: DataFrame, partitions: Int = 0): org.apache.spark.sql.Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    val ds = media.select($"media_id", $"payload", $"kind").as[MediaRecord]
    val repartitioned =
      if (partitions > 0) ds.repartition(partitions, $"media_id") else ds
    repartitioned.mapPartitions { records =>
      // (real pipeline: initialize codec / feature model HERE, once)
      records.map { r =>
        val n = r.payload.length
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < n) { h = (h ^ (r.payload(i) & 0xffL)) * 0x100000001b3L; i += 1 }
        val feature = Array.tabulate(8) { j =>
          (((h >>> (j * 8)) & 0xffL).toFloat) / 255f
        }
        DecodedMedia(r.media_id, r.kind, n, (n % 640) + 16, (n % 480) + 16, feature)
      }
    }
  }

  /** Decoded metadata per media row — binary in, typed features out. */
  def q40MediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fakeDecode(mediaTable(spark, dir))
      .select($"media_id", $"kind", $"n_bytes", $"width", $"height", $"n_frames")
      .orderBy($"media_id")
  }

  /** Resize stage (STUB geometry, real pipeline shape): fit each image into
    * a 224×224 box preserving aspect ratio — the metadata arithmetic every
    * vision-model preprocessor runs before the (stubbed) pixel resample. */
  def q51MediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fakeDecode(mediaTable(spark, dir))
      .filter($"kind" === "image")
      .withColumn("scale",
        lit(224.0) / greatest($"width", $"height").cast("double"))
      .select($"media_id", $"width", $"height",
        greatest(lit(1), floor($"width" * $"scale").cast("int")).as("new_width"),
        greatest(lit(1), floor($"height" * $"scale").cast("int")).as("new_height"),
        round($"scale", 6).as("scale"))
      .orderBy($"media_id")
  }

  case class PpmMedia(media_id: Long, payload: Array[Byte])
  case class PpmDecoded(media_id: Long, width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double,
                        rz_mean_r: Double, rz_mean_g: Double, rz_mean_b: Double)

  /** q140: REAL image decode + resample over binary media columns — P6 PPM
    * through [[Ppm]] (pure-JVM codec, no libraries). The synthetic corpus
    * encodes one image per document (w = 16 + id mod 97, h = 16 + id mod 83,
    * deterministic pixel formula); the batch stage then runs the genuine
    * pipeline on executor byte arrays: header parse → pixel-scan channel
    * means → nearest-neighbor 32×32 resize → means of the RESAMPLED bytes.
    *
    * Oracle-checked: the pixel model gives every reported mean a closed
    * form in (w, h) (see [[Ppm]] scaladoc), so the DuckDB oracle predicts
    * the decode output from arithmetic alone — a misparsed header, swapped
    * dimension, channel-phase shift, or wrong resample mapping breaks the
    * identity. The id cap (< 2000) bounds the synthetic corpus; decode cost
    * scales with pixels, not documents, and the mapPartitions batch shape
    * is exactly [[decodeBatched]]'s. */
  def q140PpmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter($"doc_id" < 2000).select($"doc_id").as[Long]
    val media = ids.mapPartitions(_.map { d =>
      PpmMedia(d, Ppm.encode((16 + d % 97).toInt, (16 + d % 83).toInt))
    })
    media.mapPartitions { records =>
      records.map { m =>
        val img = Ppm.decode(m.payload)
        val (r, g, b) = Ppm.channelMeans(img)
        val rz = Ppm.resizeNearest(img, 32, 32)
        val (rr, rg, rb) = Ppm.channelMeans(rz)
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        PpmDecoded(m.media_id, img.width, img.height,
          r6(r), r6(g), r6(b), r6(rr), r6(rg), r6(rb))
      }
    }.toDF().orderBy($"media_id")
  }

  case class BmpMedia(media_id: Long, payload: Array[Byte])
  case class BmpDecoded(media_id: Long, n_bytes: Int, width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double,
                        top_g: Double)

  /** q206: REAL image decode over the SECOND raster family — uncompressed
    * 24-bpp Windows BMP through [[Bmp]] (pure-JVM, no libraries). Where
    * q140's P6 PPM is a raw byte dump behind an ASCII header, BMP carries
    * the decode traps production rasters have: bottom-up row storage, BGR
    * channel order, 4-byte row padding, and a header-declared pixel offset
    * — each of which this query's oracle can catch (see below). One image
    * per document (w = 16 + id mod 61 — all four pad residues occur;
    * h = 16 + 2·(id mod 41), even so the top-half statistic has an exact
    * closed form), decoded on executor byte arrays in the
    * [[decodeBatched]] mapPartitions shape.
    *
    * Oracle-checked: no channel value wraps (w + h ≤ 172 < 256), so
    * mean_r = (w−1)/2, mean_g = (h−1)/2, mean_b = (w+h−2)/2, file length
    * = 54 + h·ceil4(3w), and the row-order witness top_g = (h/2 − 1)/2 —
    * whole-image means are row-order-invariant, so top_g (mean green over
    * the logical top half) is the column that breaks if the bottom-up flip
    * is skipped, while mean_r vs mean_b breaks if the BGR swap is. */
  def q206BmpDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter($"doc_id" < 2000).select($"doc_id").as[Long]
    val media = ids.mapPartitions(_.map { d =>
      BmpMedia(d, Bmp.encode((16 + d % 61).toInt, (16 + 2 * (d % 41)).toInt))
    })
    media.mapPartitions { records =>
      records.map { m =>
        val img = Bmp.decode(m.payload)
        val (r, g, b) = Bmp.channelMeans(img)
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        BmpDecoded(m.media_id, m.payload.length, img.width, img.height,
          r6(r), r6(g), r6(b), r6(Bmp.topHalfGreenMean(img)))
      }
    }.toDF().orderBy($"media_id")
  }

  case class GifMedia(media_id: Long, payload: Array[Byte])
  case class GifDecoded(media_id: Long, width: Int, height: Int,
                        interlaced: Boolean,
                        mean_r: Double, mean_g: Double, mean_b: Double,
                        top_r: Double)

  /** q207: REAL image decode over the THIRD raster family — GIF87a through
    * [[Gif]] (pure-JVM LZW, no libraries). The first ENTROPY-CODED member
    * of the codec trio: where q140's PPM is a raw dump and q206's BMP is a
    * layout exercise, the GIF pixel array only exists after a real
    * variable-width LZW decompression (9→12-bit codes, dictionary build,
    * KwKwK case, sub-block reassembly) — a desync anywhere corrupts every
    * downstream pixel and the oracle catches it arithmetically. One image
    * per document (w = 16 + id mod 31, h = 16 + id mod 25 — odd heights
    * occur, exercising the ⌊h/2⌋ witness; ODD ids store INTERLACED, so
    * both row orders are decoded in every run), decoded on executor byte
    * arrays in the [[decodeBatched]] mapPartitions shape.
    *
    * Oracle-checked: index(x,y) = x + y never wraps (max index w+h−2 = 84
    * at the 46×40 grid corner), and palette blue i+170 stays unwrapped by
    * a margin of exactly ONE (wrap starts at index 86) — widen the size
    * grid only with that bound re-checked. So mean_r =
    * (w+h−2)/2, mean_g = mean_r + 85, mean_b = mean_r + 170, and the
    * interlace witness top_r = (w−1)/2 + (⌊h/2⌋−1)/2 — whole-image means
    * are row-order-invariant, so top_r is the column that breaks if the
    * 4-pass deinterlace is skipped. */
  def q207GifDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter($"doc_id" < 2000).select($"doc_id").as[Long]
    val media = ids.mapPartitions(_.map { d =>
      GifMedia(d, Gif.encode((16 + d % 31).toInt, (16 + d % 25).toInt,
        interlaced = d % 2 == 1))
    })
    media.mapPartitions { records =>
      records.map { m =>
        val img = Gif.decode(m.payload)
        val (r, g, b) = Gif.channelMeans(img)
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        GifDecoded(m.media_id, img.width, img.height, m.media_id % 2 == 1,
          r6(r), r6(g), r6(b), r6(Gif.topHalfRedMean(img)))
      }
    }.toDF().orderBy($"media_id")
  }

  case class PngMedia(media_id: Long, payload: Array[Byte])
  case class PngDecoded(media_id: Long, width: Int, height: Int,
                        interlaced: Boolean,
                        mean_r: Double, mean_g: Double, mean_b: Double,
                        top_r: Double)

  /** q208: REAL image decode over the FOURTH raster family — 8-bit
    * truecolor PNG through [[Png]] (pure-JVM; the DEFLATE layer is the
    * JDK's `Inflater`, no libraries). PNG completes the codec family's
    * trap taxonomy: where q140's PPM is a raw dump, q206's BMP is layout
    * traps and q207's GIF is dictionary entropy coding, the PNG pixel
    * array only exists after CRC-validated big-endian chunk walking,
    * multi-IDAT zlib reassembly, and per-scanline PREDICTIVE FILTER
    * reconstruction — the encoder cycles all five filter types
    * (None/Sub/Up/Average/Paeth) across rows, and filters chain on the
    * reconstructed prior row, so one wrong byte corrupts every later row
    * and lands in the means. One image per document (w = 16 + id mod 31,
    * h = 16 + id mod 25 — odd heights exercise the ⌊h/2⌋ witness; ODD ids
    * store Adam7-INTERLACED, so both layouts decode in every run), decoded
    * on executor byte arrays in the [[decodeBatched]] mapPartitions shape.
    *
    * Oracle-checked: r(x,y) = x + y, g = x, b = y, none wrapping (max
    * channel value 84 at the 46×40 grid corner, far under 255), so
    * mean_r = (w+h−2)/2, mean_g = (w−1)/2, mean_b =
    * (h−1)/2, and the Adam7 witness top_r = (w−1)/2 + (⌊h/2⌋−1)/2 —
    * whole-image means are placement-invariant, so top_r is the column
    * that breaks if pass geometry is wrong. `n_bytes` has no closed form
    * (DEFLATE output length is content-dependent), so the byte-length
    * check lives in PngSpec, not the oracle. */
  def q208PngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter($"doc_id" < 2000).select($"doc_id").as[Long]
    val media = ids.mapPartitions(_.map { d =>
      PngMedia(d, Png.encode((16 + d % 31).toInt, (16 + d % 25).toInt,
        interlaced = d % 2 == 1))
    })
    media.mapPartitions { records =>
      records.map { m =>
        val img = Png.decode(m.payload)
        val (r, g, b) = Png.channelMeans(img)
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        PngDecoded(m.media_id, img.width, img.height, m.media_id % 2 == 1,
          r6(r), r6(g), r6(b), r6(Png.topHalfRedMean(img)))
      }
    }.toDF().orderBy($"media_id")
  }

  case class WavMedia(media_id: Long, payload: Array[Byte])
  case class WavDecoded(media_id: Long, n_samples: Int, sample_rate: Int,
                        duration_s: Double, mean_amp: Double, rms: Double,
                        peak: Int)

  /** q141: REAL audio decode over binary media columns — RIFF/WAVE PCM16
    * through [[Wav]] (pure-JVM chunk walker, no libraries): the audio twin
    * of [[q140PpmDecode]]. One synthetic waveform per document
    * (n = 1000 + 3·(id mod 777) sawtooth samples at 8 kHz), decoded and
    * reduced to duration / mean / RMS / peak on executor byte arrays.
    * Oracle-checked: the sawtooth's partial-cycle sums give every statistic
    * a closed form in n (see [[Wav]] scaladoc), so the DuckDB oracle
    * predicts the decoder's output from arithmetic alone. */
  def q141WavDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter($"doc_id" < 2000).select($"doc_id").as[Long]
    val media = ids.mapPartitions(_.map { d =>
      WavMedia(d, Wav.encode((1000 + (d % 777) * 3).toInt))
    })
    media.mapPartitions { records =>
      records.map { m =>
        val audio = Wav.decode(m.payload)
        val (n, dur, mean, rms, peak) = Wav.stats(audio)
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        WavDecoded(m.media_id, n, audio.sampleRate, r6(dur), r6(mean), r6(rms), peak)
      }
    }.toDF().orderBy($"media_id")
  }

  /** q209: REAL audio decode over the SECOND audio codec — ITU-T G.711
    * µ-law in the WAV container through [[Wav]] (format tag 7, the
    * telephony companding standard; pure-JVM, no libraries). Where q141's
    * PCM16 is a raw little-endian sample walk, the µ-law sample array
    * only exists after the logarithmic EXPANSION (complement /
    * segment / mantissa → 14-bit-magnitude linear), and the non-PCM WAV
    * grammar adds two real parser traps: the 18-byte WAVEFORMATEX fmt
    * shape (cbSize tail) and the REQUIRED `fact` chunk, which the decoder
    * cross-checks against the data payload. One waveform per document
    * (n = 800 + 3·(id mod 555) code bytes, code_k = (7k) mod 256 —
    * coprime step, so every 256-sample cycle visits ALL 256 codes: both
    * sign halves, every segment, every mantissa), decoded on executor
    * byte arrays in the [[decodeBatched]] mapPartitions shape.
    *
    * Oracle-checked BYTE-FOR-BYTE: the expansion has the closed form
    * mag = (8·man + 132)·2^exp − 132, which the DuckDB oracle evaluates
    * over the same generated code stream and aggregates — mean, RMS and
    * peak (32124, from code 0 at k = 0) must match the Scala expansion
    * exactly, so a wrong complement, segment shift, or bias breaks the
    * hash. */
  def q209MulawDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter($"doc_id" < 2000).select($"doc_id").as[Long]
    val media = ids.mapPartitions(_.map { d =>
      WavMedia(d, Wav.encodeMulaw((800 + 3 * (d % 555)).toInt))
    })
    media.mapPartitions { records =>
      records.map { m =>
        val audio = Wav.decode(m.payload)
        val (n, dur, mean, rms, peak) = Wav.stats(audio)
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        WavDecoded(m.media_id, n, audio.sampleRate, r6(dur), r6(mean), r6(rms), peak)
      }
    }.toDF().orderBy($"media_id")
  }

  case class Y4mMedia(media_id: Long, payload: Array[Byte])
  case class FrameRow(media_id: Long, width: Int, height: Int, n_frames: Int,
                      frame_idx: Int, luma_mean: Double)

  /** q142: REAL video frame demux + per-frame analysis — YUV4MPEG2 through
    * [[Y4m]] (pure-JVM container parse, no libraries): the video member of
    * the codec-free trio (q140 image, q141 audio). One synthetic I420
    * stream per document (w = 16 + 2·(id mod 25), h = 16 + 2·(id mod 17),
    * 1 + id mod 7 frames), demuxed on executors; every SECOND frame is
    * sampled (the q41 stride pattern, now over real frame bytes) and its
    * luma plane scanned for mean brightness — the explode-shaped stage a
    * video curation pipeline runs before per-frame featurize.
    * Oracle-checked: the pixel model gives each frame's luma mean the
    * closed form (w−1)/2 + (h−1)/2 + 10f (see [[Y4m]] scaladoc). */
  def q142VideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter($"doc_id" < 2000).select($"doc_id").as[Long]
    val media = ids.mapPartitions(_.map { d =>
      Y4mMedia(d, Y4m.encode(
        (16 + 2 * (d % 25)).toInt, (16 + 2 * (d % 17)).toInt, (1 + d % 7).toInt))
    })
    media.mapPartitions { records =>
      records.flatMap { m =>
        val v = Y4m.decode(m.payload)
        def r6(x: Double) = math.rint(x * 1e6) / 1e6
        v.frames.indices.by(2).map { f =>
          FrameRow(m.media_id, v.width, v.height, v.frames.length, f,
            r6(Y4m.lumaMean(v.frames(f))))
        }
      }
    }.toDF().orderBy($"media_id", $"frame_idx")
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

  /** q161: file-per-object media ingest — the OTHER half of the multimodal
    * story. q140 decodes payloads already sitting in a binary COLUMN; real
    * image corpora start as millions of individual FILES, and this query
    * runs that ingest: `binaryFile` source over a directory of genuine
    * `.ppm` files ([[graft.sources.Staged.ppmFilesDir]]), `pathGlobFilter`
    * excluding the stray non-media file every crawl directory contains, id
    * recovered from the path, then the same executor-side [[Ppm]] decode.
    * The DuckDB oracle predicts every output — including each file's exact
    * on-disk LENGTH from the P6 header grammar — from arithmetic alone, so
    * a wrong glob, a truncated write, or a header misparse all break it.
    *
    * Scale shape: `binaryFile` lists and reads files in parallel across
    * executors (one task per file batch), so a 100 TB image crawl ingests
    * at scan speed; the decode is per-file CPU on the executor holding the
    * bytes, and nothing ever concentrates on the driver. */
  def q161BinaryFileIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = graft.sources.Staged.ppmFilesDir(spark, dir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.ppm").load(root)
      .select(
        regexp_extract($"path", "img_(\\d+)\\.ppm$", 1).cast("long")
          .as("media_id"),
        $"length".as("file_len"), $"content")
      .as[(Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (id, len, bytes) =>
        val img = Ppm.decode(bytes)
        val (r, g, b) = Ppm.channelMeans(img)
        def r6(v: Double) = math.rint(v * 1e6) / 1e6
        (id, len, img.width, img.height, r6(r), r6(g), r6(b))
      })
      .toDF("media_id", "file_len", "width", "height",
        "mean_r", "mean_g", "mean_b")
      .orderBy($"media_id")
  }
}
