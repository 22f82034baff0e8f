package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "aaaa"), (1L, "bbbbbbbb"), (2L, "cccccccccccccccc"),
    (3L, "d" * 200))
    .toDF("doc_id", "text")

  test("asset table schema: binary + typed metadata") {
    val a = Multimodal.assetsFrom(docs, "doc_id", "text")
    assert(a.schema("bytes").dataType.typeName == "binary")
    assert(a.schema("meta").dataType.typeName == "struct")
    val r = a.filter($"asset_id" === 0).first()
    assert(r.getAs[String]("kind") == "image")
    assert(new String(r.getAs[Array[Byte]]("bytes"), "UTF-8") == "aaaa")
  }

  test("feature extraction: deterministic, batch-shaped, normalized") {
    val a = Multimodal.assetsFrom(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(spark, a).orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(spark, a).orderBy("asset_id").collect()
    assert(f1.toSeq.map(_.toString) == f2.toSeq.map(_.toString))
    val feats = f1.head.getSeq[Float](f1.head.fieldIndex("features"))
    assert(feats.length == 8)
    assert(math.abs(feats.sum - 1.0f) < 1e-5, "histogram normalized")
    assert(f1.head.getAs[Long]("n_bytes") == 4L)
  }

  test("frame sampling: video explodes to byte-slice frames") {
    val a = Multimodal.assetsFrom(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(a, frameBytes = 64, maxFrames = 16)
    // doc 3 has id%3==0 → image? kind cycle: 0→image,1→audio,2→video
    val byKind = frames.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("image") >= 1 && byKind("audio") >= 1)
    // video doc_id=2 has 16 bytes → 1 frame; every non-video exactly 1
    val perAsset = frames.groupBy("asset_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perAsset(0L) == 1L && perAsset(1L) == 1L)
    assert(perAsset(2L) == 1L)
  }

  test("resize rewrites metadata and shrinks payload proportionally") {
    val a = Multimodal.assetsFrom(docs, "doc_id", "text")
    val r = Multimodal.resize(a, 8, 8).filter($"asset_id" === 3).first()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getInt(0) == 8 && meta.getInt(1) == 8)
    val n = r.getAs[Array[Byte]]("bytes").length
    assert(n < 200 && n >= 1, s"payload $n") // shrunk from 200 bytes
    assert(meta.getLong(3) == n.toLong)      // n_bytes tracks payload
    // upscale never grows the payload
    val up = Multimodal.resize(a, 4096, 4096).filter($"asset_id" === 0).first()
    assert(up.getAs[Array[Byte]]("bytes").length == 4)
  }

  private lazy val pngBytes: Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/gradient.png").toURI))

  /** An asset frame holding the real 16×12 gradient PNG fixture plus
    * an opaque text payload — exercises both decode paths in one run.
    */
  private def fixtureAssets = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(10L, "image", pngBytes, Row(16, 12, 16000, pngBytes.length.toLong)),
        Row(11L, "image", "not an image".getBytes("UTF-8"),
          Row(100, 50, 16000, 12L))),
      Multimodal.assetSchema)
  }

  test("real decode: PNG fixture yields pixel dims and luminance histogram") {
    val f = Multimodal.extractFeatures(spark, fixtureAssets)
      .orderBy("asset_id").collect()
    val png = f(0)
    // real path: true pixel dimensions from the decoded image
    assert(png.getInt(png.fieldIndex("width")) == 16)
    assert(png.getInt(png.fieldIndex("height")) == 12)
    val feats = png.getSeq[Float](png.fieldIndex("features"))
    assert(feats.length == 8 && math.abs(feats.sum - 1.0f) < 1e-5)
    // the gradient covers the full luminance range → no single
    // dominant bin, unlike the byte histogram of PNG's deflate stream
    assert(feats.count(_ > 0f) >= 4, s"gradient spread: $feats")
    assert(feats.toArray.toSeq != Multimodal.fakeDecode(pngBytes).toSeq,
      "features must come from pixels, not compressed bytes")
    // exact agreement with a direct decode of the same fixture
    val Some((w, h, direct)) = Multimodal.decodeImage(pngBytes)
    assert(w == 16 && h == 12 && feats == direct.toSeq)
    // opaque payload: fallback with null dims
    val txt = f(1)
    assert(txt.isNullAt(txt.fieldIndex("width")))
    assert(txt.getSeq[Float](txt.fieldIndex("features")) ==
      Multimodal.fakeDecode("not an image".getBytes("UTF-8")).toSeq)
  }

  test("real decode: WAV fixture yields sample rate and amplitude histogram") {
    val wavBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/tone.wav").toURI))
    import org.apache.spark.sql.Row
    val assets = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(20L, "audio", wavBytes, Row(0, 0, 8000, wavBytes.length.toLong))),
      Multimodal.assetSchema)
    val f = Multimodal.extractFeatures(spark, assets).first()
    // real path: the decoded sample rate, not the metadata's claim
    assert(f.getInt(f.fieldIndex("sample_rate")) == 8000)
    assert(f.isNullAt(f.fieldIndex("width")))
    val feats = f.getSeq[Float](f.fieldIndex("features"))
    assert(feats.length == 8 && math.abs(feats.sum - 1.0f) < 1e-5)
    // a 12000-amplitude sine occupies bins 0..2 (|s| < 16384) and
    // never the top bins — unlike the byte histogram of the RIFF
    // container, which scatters across all 8
    assert(feats(0) > 0f && feats(1) > 0f && feats(2) > 0f, feats)
    assert(feats(3) == 0f && feats(7) == 0f, feats)
    assert(feats != Multimodal.fakeDecode(wavBytes).toSeq,
      "features must come from samples, not container bytes")
    // exact agreement with a direct decode
    val Some((rate, direct)) = Multimodal.decodeAudio(wavBytes)
    assert(rate == 8000 && feats == direct.toSeq)
  }

  test("resizeImages: real rescale for PNG, resize-identical fallback") {
    val out = Multimodal.resizeImages(spark, fixtureAssets, 8, 6)
      .orderBy("asset_id").collect()
    val png = out(0)
    val newBytes = png.getAs[Array[Byte]]("bytes")
    // output is a real PNG at the target dimensions
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(newBytes))
    assert(img != null && img.getWidth == 8 && img.getHeight == 6)
    val meta = png.getStruct(png.fieldIndex("meta"))
    assert(meta.getInt(0) == 8 && meta.getInt(1) == 6)
    assert(meta.getLong(3) == newBytes.length.toLong)
    // rescaled pixels preserve the horizontal gradient direction
    assert((img.getRGB(7, 3) >> 16 & 0xff) > (img.getRGB(0, 3) >> 16 & 0xff))
    // opaque payloads take EXACTLY the column-level resize semantics
    val a = Multimodal.assetsFrom(docs, "doc_id", "text")
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows.toSeq.map { r =>
      (r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]]("bytes").toSeq,
        r.getStruct(r.fieldIndex("meta")).toString)
    }
    val viaReal = shape(Multimodal.resizeImages(spark, a, 8, 8)
      .orderBy("asset_id").collect())
    val viaCols = shape(Multimodal.resize(a, 8, 8)
      .orderBy("asset_id").collect())
    assert(viaReal == viaCols)
  }

  test("frame sampling: long video yields multiple capped frames") {
    val longDocs = Seq((2L, "x" * 1000)).toDF("doc_id", "text")
    val a = Multimodal.assetsFrom(longDocs, "doc_id", "text")
    assert(a.first().getAs[String]("kind") == "video")
    val n = Multimodal.sampleFrames(a, frameBytes = 64, maxFrames = 16).count()
    assert(n == 16L, s"expected cap at 16 frames, got $n") // 1000/64→16 capped
  }

  test("interleaved packing charges text plus per-modality budgets") {
    // ids 0/1/2 -> image/audio/video (kindOf cycles from id % 3)
    val docs = Seq(
      (0L, "a b c"),        // image: 3 + 256 = 259
      (1L, "d e"),          // audio: 2 + 128 = 130
      (2L, "f")             // video: 1 + 1024 = 1025
    ).toDF("doc_id", "text")
    val out = Multimodal.packInterleaved(docs, "doc_id", "text",
      seqLen = 512, nShards = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out(0L)._1 == "image" && out(0L)._2 == 3L && out(0L)._3 == 256L)
    assert(out(1L)._1 == "audio" && out(1L)._3 == 128L)
    assert(out(2L)._1 == "video" && out(2L)._3 == 1024L)
    // one shard: total stream = 259 + 130 + 1025 = 1414 tokens over
    // 512-token sequences; every doc's span must be consistent
    out.values.foreach { case (_, ntt, nat, first, last) =>
      assert(first <= last && first >= 0)
      assert(last <= (1414 - 1) / 512)
      assert(ntt >= 0 && nat > 0)
    }
    // the video doc (1025 tokens) must straddle at least two sequences
    assert(out(2L)._5 > out(2L)._4)
  }
}
