package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input/output rows of [[Multimodal.decodeAndFeaturize]] — top-level case
  * classes so Spark can derive Encoders (an inner class can't be encoded). */
private[graft] case class MediaIn(media_id: Long, kind: String,
    payload: Array[Byte])
private[graft] case class MediaDecoded(media_id: Long, kind: String,
    width: Int, height: Int, mean_intensity: Double, n_sampled_frames: Int,
    features: Array[Float])
private[graft] case class MediaFrame(media_id: Long, kind: String,
    frame_idx: Int, frame: Array[Byte])

/** Multimodal-column plumbing for training-data pipelines: media travels as
  * an opaque `binary` column with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run per-partition so one task
  * amortizes codec setup over its whole batch (the Scala analogue of a
  * batched `mapInPandas`).
  *
  * Codec reality, by modality: IMAGE payloads that carry a genuine
  * container (PNG/JPEG/GIF/BMP, magic-byte-detected) decode, measure, and
  * resize through [[JdkImageCodec]] — real pixels via pure-JDK
  * `javax.imageio`, no external libraries. Audio/video codecs are NOT in
  * this container (and not in the JDK), so [[FakeCodec]] remains the
  * clearly-marked deterministic stand-in for them and for opaque/synthetic
  * payloads (q64's byte-exact oracle replays it) — the Spark-side contract
  * (schema, batching, partitioning, null handling) is identical on both
  * paths, so swapping in an ffmpeg-style decoder is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried beside the binary payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** STUB CODEC — deterministic fake in place of image/audio libraries that
    * are not installed here. Every function is pure on the payload bytes. */
  object FakeCodec {
    /** "Decode" → (width, height, mean intensity): derived from byte stats. */
    def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
      if (payload == null || payload.isEmpty) return (0, 0, 0.0)
      val w = 16 + math.floorMod(payload(0).toInt, 16)
      val h = 16 + math.floorMod(payload(payload.length - 1).toInt, 16)
      var s = 0L; payload.foreach(b => s += (b & 0xff))
      (w, h, s.toDouble / payload.length)
    }

    /** "Resize": crops/pads the payload to size*size bytes. */
    def resize(payload: Array[Byte], size: Int): Array[Byte] = {
      val out = new Array[Byte](size * size)
      if (payload != null)
        System.arraycopy(payload, 0, out, 0, math.min(payload.length, out.length))
      out
    }

    /** "Frame sample": every nth chunk of the payload as a frame. */
    def sampleFrames(payload: Array[Byte], frameBytes: Int, everyNth: Int): Seq[Array[Byte]] = {
      if (payload == null || frameBytes <= 0) return Seq.empty
      payload.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % everyNth == 0 => f }.toSeq
    }

    /** "Feature extract": 8-d byte-histogram embedding of the payload. */
    def features(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](8)
      if (payload != null)
        payload.foreach(b => hist((b & 0xff) >> 5) += 1.0f)
      val n = math.max(1, if (payload == null) 0 else payload.length)
      hist.map(_ / n)
    }
  }

  /** REAL image codec — pure-JDK `javax.imageio` (PNG / JPEG / GIF / BMP),
    * no external libraries. Payloads that carry a genuine image container
    * (detected by MAGIC BYTES) decode, measure, and resize through this
    * path; everything else — including the synthetic payloads q64's
    * byte-exact DuckDB oracle replays — keeps the deterministic
    * [[FakeCodec]] contract. Audio/video stay stubbed (the JDK ships no
    * codec for them). Decode failures on a magic-matched payload fall
    * back to the stub rather than failing the batch (a corrupt image in
    * 100 TB of scraped media must not kill the stage). */
  object JdkImageCodec {
    def looksLikeImage(p: Array[Byte]): Boolean =
      p != null && p.length >= 4 &&
        ((p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
         (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||
         (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
         (p(0) == 'B' && p(1) == 'M'))

    private def read(p: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      // no /tmp spill per call on executors
      javax.imageio.ImageIO.setUseCache(false)
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
      catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Decode → (width, height, mean intensity): mean of per-pixel RGB
      * averages over the full raster. */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] =
      read(payload).map { img =>
        val w = img.getWidth; val h = img.getHeight
        var s = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            s += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        (w, h, s / (w.toLong * h))
      }

    /** Resize to size×size and re-encode as PNG (lossless, so a resized
      * payload round-trips through [[decodeImage]] exactly). */
    def resize(payload: Array[Byte], size: Int): Option[Array[Byte]] =
      read(payload).map { img =>
        val out = new java.awt.image.BufferedImage(size, size,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, size, size, null) finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        baos.toByteArray
      }
  }

  /** Synthesize a deterministic media table over doc ids (payload bytes are
    * a hash-seeded function of the id, so tests are reproducible). */
  def syntheticMedia(docs: DataFrame, idCol: String): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    docs.select(
      col(idCol).as("media_id"),
      element_at(kinds, (col(idCol) % 3 + 1).cast("int")).as("kind"),
      // payload = utf8 bytes of a per-id seed string, repeated
      repeat(sha2(col(idCol).cast("string"), 256), 4).cast("binary").as("payload"),
      struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(44100).as("sample_rate"),
        (col(idCol) % 100 + 1).cast("int").as("n_frames"),
        lit("fake").as("codec")).as("meta"))
  }

  /** Payload→payload transform (resize): binary in, binary out, the same
    * typed per-partition shape as the decode stage — the payload column
    * stays opaque for downstream stages, so resize chains ahead of decode
    * or export without breaking the schema contract. */
  def resizePayloads(media: DataFrame, size: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaIn]
      .mapPartitions(_.map { m =>
        val real =
          if (m.kind == "image" && JdkImageCodec.looksLikeImage(m.payload))
            JdkImageCodec.resize(m.payload, size)
          else None
        MediaIn(m.media_id, m.kind,
          real.getOrElse(FakeCodec.resize(m.payload, size)))
      })
      .toDF()
  }

  /** Frame sampling (video → frames): one input row explodes into one row
    * per sampled frame — the fan-out transform of the family (decode is
    * 1:1, resize is 1:1, sampling is 1:N). */
  def sampleFramePayloads(media: DataFrame, frameBytes: Int,
      everyNth: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaIn]
      .flatMap { m =>
        FakeCodec.sampleFrames(m.payload, frameBytes, everyNth)
          .zipWithIndex.map { case (f, i) =>
            MediaFrame(m.media_id, m.kind, i, f)
          }
      }.toDF()
  }

  /** Decode + feature-extract, one codec instance per partition. Narrow (no
    * shuffle): at 100 TB this runs inside the scan stage, and partition
    * sizing is controlled by spark.sql.files.maxPartitionBytes.
    *
    * A typed `Dataset.mapPartitions` — NOT an `.rdd` hop — so the stage
    * composes with Catalyst planning on both sides: upstream column pruning
    * still reaches the source scan, and exactly one
    * deserialize→decode→serialize boundary exists (pinned in
    * MultimodalSpec). */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaIn]
      .mapPartitions { rows =>
        // per-partition codec setup is amortized here (ImageIO reader
        // registry warm-up happens once per JVM; the stub needs none)
        rows.map { m =>
          val real =
            if (m.kind == "image" && JdkImageCodec.looksLikeImage(m.payload))
              JdkImageCodec.decodeImage(m.payload)
            else None
          real match {
            case Some((w, h, mean)) =>
              // a decoded still image IS its one frame; features stay the
              // payload-level histogram (same embedding space as the stub)
              MediaDecoded(m.media_id, m.kind, w, h,
                math.round(mean * 10000.0) / 10000.0,
                1, FakeCodec.features(m.payload))
            case None =>
              val (w, h, mean) = FakeCodec.decodeImage(m.payload)
              val frames = FakeCodec.sampleFrames(m.payload, 64, 4)
              MediaDecoded(m.media_id, m.kind, w, h,
                math.round(mean * 10000.0) / 10000.0,
                frames.length, FakeCodec.features(m.payload))
          }
        }
      }.toDF()
  }
}
