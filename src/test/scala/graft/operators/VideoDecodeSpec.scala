package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import MediaFixtures._

/** Real MJPEG pixel decode: container parse + per-frame JPEG decode in
  * pure JVM, end-to-end over both containers and through the public
  * operators, plus fuzz over mutated containers.
  */
class VideoDecodeSpec extends SparkSpec {
  import spark.implicits._

  // three solid frames: black, mid-gray (128), white → luminance bins
  // 0, 4, 7 (JPEG is lossy but a solid frame stays within its 32-wide
  // bin after roundtrip)
  private lazy val frames = Seq(
    jpegFrame(16, 12, 0x000000),
    jpegFrame(16, 12, 0x808080),
    jpegFrame(16, 12, 0xffffff))
  private lazy val avi = mjpegAvi(frames, w = 16, h = 12)
  private lazy val mp4 = mjpegMp4(frames, w = 16, h = 12)

  test("decodeVideo: MJPEG-in-AVI decodes true pixels per frame") {
    val Some((w, h, n, hist)) = Multimodal.decodeVideo(avi)
    assert(w == 16 && h == 12, "dims from decoded pixels, not headers")
    assert(n == 3, "all three frames decoded")
    assert(math.abs(hist.sum - 1.0f) < 1e-4)
    // each solid frame puts ~all its mass in one bin → averaged ≈ 1/3
    for (bin <- Seq(0, 4, 7))
      assert(hist(bin) > 0.30f && hist(bin) < 0.37f,
        s"bin $bin = ${hist(bin)} — expected ~1/3 from a solid frame")
  }

  test("decodeVideo: MJPEG-in-MP4 walks the sample table to pixels") {
    val Some((w, h, n, hist)) = Multimodal.decodeVideo(mp4)
    assert(w == 16 && h == 12 && n == 3)
    for (bin <- Seq(0, 4, 7)) assert(hist(bin) > 0.30f, s"bin $bin")
  }

  test("decodeVideo: even spread when frames exceed maxFrames") {
    val many = Seq.tabulate(12)(i => jpegFrame(8, 8, i * 0x151515))
    val Some((_, _, n, _)) =
      Multimodal.decodeVideo(mjpegAvi(many, 8, 8), maxFrames = 4)
    assert(n == 4, "decodes exactly maxFrames evenly-spaced samples")
  }

  test("decodeVideo: non-container and non-JPEG payloads fall through") {
    assert(Multimodal.decodeVideo("plain text".getBytes).isEmpty)
    // a structurally valid AVI whose frames are junk (no JPEG magic)
    val junk = mjpegAvi(Seq(Array.fill[Byte](64)(0x17)), 16, 12)
    assert(Multimodal.decodeVideo(junk).isEmpty)
  }

  test("extractFeatures: video branch emits real dims + pixel features") {
    val assets = Seq((2L, "video", avi), (5L, "video", mp4))
      .toDF("asset_id", "kind", "bytes")
      .withColumn("meta", struct(lit(16).as("width"), lit(12).as("height"),
        lit(null).cast("int").as("sample_rate"),
        length($"bytes").cast("long").as("n_bytes")))
    val out = Multimodal.extractFeatures(spark, assets)
      .orderBy("asset_id").collect()
    for (r <- out) {
      assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 12)
      val feats = r.getSeq[Float](r.fieldIndex("features"))
      assert(feats(0) > 0.30f && feats(7) > 0.30f,
        "luminance histogram, not the byte-histogram fallback")
    }
  }

  test("extractFeatures: opaque video bytes keep the pinned fallback") {
    // the m01 oracle pins the byte-histogram path for the synthetic
    // corpus — adding the video branch must not disturb it
    val assets = Multimodal.assetsFrom(
      Seq((2L, "some plain text")).toDF("doc_id", "text"), "doc_id", "text")
    val r = Multimodal.extractFeatures(spark, assets).first()
    assert(r.isNullAt(r.fieldIndex("width")))
    val expected = Multimodal.fakeDecode("some plain text".getBytes).toSeq
    assert(r.getSeq[Float](r.fieldIndex("features")) == expected)
  }

  test("videoFrameFeatures: per-frame rows with a decoded flag") {
    val assets = Seq(
      (2L, "video", avi),           // 3 decodable MJPEG frames
      (8L, "video", "x".getBytes),  // fallback byte-slice frame
      (1L, "audio", "y".getBytes))  // non-video: single frame 0
      .toDF("asset_id", "kind", "bytes")
    val rows = Multimodal.videoFrameFeatures(assets)
      .orderBy("asset_id", "frame_idx").collect()
    val mj = rows.filter(_.getLong(0) == 2L)
    assert(mj.length == 3 && mj.forall(_.getBoolean(6)))
    assert(mj.map(_.getInt(2)).toSeq == Seq(0, 1, 2))
    assert(mj.forall(r => r.getInt(3) == 16 && r.getInt(4) == 12))
    // frame 0 is solid black → all pixel mass in bin 0
    assert(mj(0).getSeq[Float](5)(0) > 0.9f)
    val fb = rows.filter(_.getLong(0) == 8L)
    assert(fb.length == 1 && !fb(0).getBoolean(6) && fb(0).isNullAt(3))
    assert(rows.count(_.getLong(0) == 1L) == 1)
  }

  test("fuzz: mutated MJPEG containers never throw or hang") {
    val rnd = new scala.util.Random(20260813L)
    for (fixture <- Seq(avi, mp4); trial <- 0 until 150) {
      val b = fixture.clone()
      trial % 3 match {
        case 0 => // flip a handful of random bytes
          for (_ <- 0 until 8)
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          Multimodal.decodeVideo(b)
        case 1 => // truncate at a random point
          Multimodal.decodeVideo(b.take(rnd.nextInt(b.length)))
        case 2 => // corrupt a size field region near the front
          val p = rnd.nextInt(math.min(64, b.length - 4))
          for (i <- 0 until 4) b(p + i) = 0xff.toByte
          Multimodal.decodeVideo(b)
      }
    }
    // and the all-zero / empty degenerate cases
    assert(Multimodal.decodeVideo(new Array[Byte](256)).isEmpty)
    assert(Multimodal.decodeVideo(Array.empty[Byte]).isEmpty)
  }
}
