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
