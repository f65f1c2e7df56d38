package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal plumbing: schema, determinism, and per-partition decode
  * behavior over opaque binary payloads (codec itself is a marked stub). */
class MultimodalSpec extends SparkTestBase {

  test("synthetic media table has the typed media schema") {
    val media = Multimodal.syntheticMedia(
      Tables(spark, sfDir, "documents"), "doc_id")
    assert(media.columns.toSeq == Seq("media_id", "kind", "payload", "meta"))
    val row = media.filter(col("media_id") === 1).collect()(0)
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(Seq("image", "audio", "video").contains(row.getString(1)))
  }

  test("decodeAndFeaturize is deterministic and keeps one row per media") {
    val media = Multimodal.syntheticMedia(
      Tables(spark, sfDir, "documents"), "doc_id")
    val a = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    val b = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == media.count())
    // features are an 8-d normalized byte histogram
    val f = a(0).getSeq[Float](6)
    assert(f.length == 8)
    assert(math.abs(f.sum - 1.0f) < 1e-3)
  }

  test("decode stage is one typed boundary, not an RDD hop") {
    val media = Multimodal.syntheticMedia(
      Tables(spark, sfDir, "documents"), "doc_id")
    val out = Multimodal.decodeAndFeaturize(media)
      .filter(col("width") >= 0).select("media_id", "width")
    val lp = out.queryExecution.optimizedPlan.toString
    assert(!lp.contains("ExistingRDD"), "decode fell back to an RDD scan")
    assert("DeserializeToObject".r.findAllIn(lp).length == 1,
      s"expected exactly one object boundary:\n$lp")
    assert("SerializeFromObject".r.findAllIn(lp).length == 1)
  }

  test("resize is payload→payload; frame sampling fans out 1:N") {
    val media = Multimodal.syntheticMedia(
      Tables(spark, sfDir, "documents"), "doc_id")
    val resized = Multimodal.resizePayloads(media, size = 8)
    assert(resized.columns.toSeq == Seq("media_id", "kind", "payload"))
    val lens = resized.collect().map(_.getAs[Array[Byte]](2).length).toSet
    assert(lens == Set(64)) // every payload exactly size*size bytes
    // frames: payload bytes grouped into 64-byte frames, every 2nd kept
    val frames = Multimodal.sampleFramePayloads(media, frameBytes = 64,
      everyNth = 2)
    assert(frames.columns.toSeq ==
      Seq("media_id", "kind", "frame_idx", "frame"))
    val one = frames.filter(col("media_id") === 1)
      .orderBy("frame_idx").collect()
    val payloadLen = media.filter(col("media_id") === 1)
      .collect()(0).getAs[Array[Byte]]("payload").length
    val expected = (0 until (payloadLen + 63) / 64).count(_ % 2 == 0)
    assert(one.length == expected)
    assert(one.map(_.getInt(2)).toSeq == (0 until expected))
  }

  test("genuine image payloads decode through the REAL JDK codec") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val gray = png(3, 2, (_, _) => 0x646464) // all rgb(100,100,100)
    val checker = png(2, 2,
      (x, y) => if ((x + y) % 2 == 0) 0x000000 else 0xFFFFFF)
    val media = Seq(
      (0L, "image", gray),
      (1L, "image", checker),
      (2L, "image", "not an image at all".getBytes("UTF-8")), // → stub
      (3L, "audio", gray)) // image bytes but wrong kind: stub path
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    // real pixels: true dimensions and exact mean intensity
    assert((out(0).getInt(2), out(0).getInt(3), out(0).getDouble(4)) ==
      ((3, 2, 100.0)), s"gray decoded as ${out(0)}")
    assert(out(0).getInt(5) == 1) // a still image is its one frame
    assert((out(1).getInt(2), out(1).getInt(3), out(1).getDouble(4)) ==
      ((2, 2, 127.5)), s"checker decoded as ${out(1)}")
    // non-image bytes and non-image kinds keep the stub contract exactly
    val stubBytes = Multimodal.FakeCodec
      .decodeImage("not an image at all".getBytes("UTF-8"))
    assert(out(2).getInt(2) == stubBytes._1)
    assert(out(3).getInt(2) == Multimodal.FakeCodec.decodeImage(gray)._1)
    // resize routes images through the real codec: an 8×8 PNG that decodes
    // back, mean preserved exactly for a solid color
    val resized = Multimodal.resizePayloads(media, size = 8)
      .orderBy("media_id").collect()
    val dec = Multimodal.JdkImageCodec
      .decodeImage(resized(0).getAs[Array[Byte]]("payload"))
    assert(dec.exists { case (w, h, m) => w == 8 && h == 8 && m == 100.0 },
      s"resized gray decoded as $dec")
    // the non-image payload still gets the byte-crop stub resize
    assert(resized(2).getAs[Array[Byte]]("payload").length == 64)
  }

  test("decode handles null/empty payloads without failing") {
    import spark.implicits._
    val media = Seq(
      (0L, "image", null.asInstanceOf[Array[Byte]]),
      (1L, "audio", Array.empty[Byte])
    ).toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeAndFeaturize(media).orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out(0).getInt(2) == 0) // width 0 for null payload
  }
}
