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
  * The actual codecs are NOT in this container, so [[FakeCodec]] is a
  * clearly-marked deterministic stand-in — the Spark-side contract (schema,
  * batching, partitioning, null handling) is real and tested; swapping in a
  * real decoder is a one-function change.
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
      .mapPartitions(_.map(m =>
        MediaIn(m.media_id, m.kind, FakeCodec.resize(m.payload, size))))
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
        // per-partition codec setup would go here (expensive init amortized)
        rows.map { m =>
          val (w, h, mean) = FakeCodec.decodeImage(m.payload)
          val frames = FakeCodec.sampleFrames(m.payload, 64, 4)
          MediaDecoded(m.media_id, m.kind, w, h,
            math.round(mean * 10000.0) / 10000.0,
            frames.length, FakeCodec.features(m.payload))
        }
      }.toDF()
  }
}
