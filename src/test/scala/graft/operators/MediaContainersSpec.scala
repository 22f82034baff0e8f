package graft.operators

import graft.SparkSpec

/** MP4/AVI container parsing (pure JVM, no codec): fixture containers
  * built box-by-box in the test, so the asserted dims/duration/frame
  * offsets are ground truth by construction; plus the integration with
  * frame sampling and a malformed-bytes fuzz sweep (same discipline as
  * the image/audio decode fuzz in MultimodalSpec).
  */
class MediaContainersSpec extends SparkSpec {
  import spark.implicits._

  // ---- fixture builders ------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ ascii(typ) ++ body
  }

  /** 5-frame 96×64 MP4: timescale 1000, duration 5000 (= 5000 ms),
    * frame sizes 10..14 split 3+2 over two chunks (exercises the stsc
    * sample-to-chunk walk, not just the 1:1 case).
    */
  private lazy val mp4Fixture: (Array[Byte], Array[Long], Array[Int]) = {
    val sizes = Array(10, 11, 12, 13, 14)
    val ftyp = mp4Box("ftyp", ascii("isom"), be32(512), ascii("isomiso2"))
    val mvhd = mp4Box("mvhd",
      new Array[Byte](12),           // version/flags + ctime + mtime
      be32(1000), be32(5000),        // timescale, duration
      new Array[Byte](80))
    val tkhd = mp4Box("tkhd",
      new Array[Byte](76),           // v0 fields + matrix
      be32(96L << 16), be32(64L << 16)) // width, height (16.16)
    val hdlr = mp4Box("hdlr",
      new Array[Byte](8), ascii("vide"), new Array[Byte](13))
    val stsz = mp4Box("stsz", new Array[Byte](4),
      be32(0), be32(sizes.length),
      sizes.flatMap(s => be32(s.toLong)))
    val stsc = mp4Box("stsc", new Array[Byte](4), be32(2),
      be32(1), be32(3), be32(1),     // chunk 1: 3 samples
      be32(2), be32(2), be32(1))     // chunk 2+: 2 samples
    // stco offsets are absolute file positions — assemble the sizes
    // first, then splice the real offsets in
    def stco(c1: Long, c2: Long) = mp4Box("stco",
      new Array[Byte](4), be32(2), be32(c1), be32(c2))
    def whole(c1: Long, c2: Long): Array[Byte] = {
      val stbl = mp4Box("stbl", stsz, stsc, stco(c1, c2))
      val minf = mp4Box("minf", stbl)
      val mdia = mp4Box("mdia", hdlr, minf)
      val trak = mp4Box("trak", tkhd, mdia)
      val moov = mp4Box("moov", mvhd, trak)
      val frames = Array.tabulate(sizes.sum)(i => (i % 251).toByte)
      ftyp ++ moov ++ mp4Box("mdat", frames)
    }
    val probe = whole(0, 0)
    val mdatPayload = probe.length - sizes.sum // mdat payload offset
    val c1 = mdatPayload.toLong
    val c2 = c1 + sizes(0) + sizes(1) + sizes(2)
    val bytes = whole(c1, c2)
    val offsets = Array(c1, c1 + 10, c1 + 21, c2, c2 + 13)
    (bytes, offsets, sizes)
  }

  /** 3-frame 32×24 AVI: 40000 µs/frame → 120 ms total. */
  private lazy val aviFixture: (Array[Byte], Array[Int]) = {
    val sizes = Array(7, 9, 5)
    val avihPayload =
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(3) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(32) ++ le32(24) ++ new Array[Byte](16)
    val avih = ascii("avih") ++ le32(avihPayload.length) ++ avihPayload
    val hdrl = ascii("LIST") ++ le32(4L + avih.length) ++ ascii("hdrl") ++ avih
    val frames = sizes.zipWithIndex.flatMap { case (s, i) =>
      val data = Array.tabulate(s)(j => (i * 31 + j).toByte)
      ascii("00dc") ++ le32(s.toLong) ++ data ++
        (if (s % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    }
    val movi = ascii("LIST") ++ le32(4L + frames.length) ++ ascii("movi") ++ frames
    val body = ascii("AVI ") ++ hdrl ++ movi
    ((ascii("RIFF") ++ le32(body.length.toLong) ++ body), sizes)
  }

  // ---- parsing ----------------------------------------------------

  test("MP4: true duration, resolution, and frame offsets from the box tree") {
    val (bytes, expOffsets, expSizes) = mp4Fixture
    val m = MediaContainers.parse(bytes).get
    assert(m.container == "mp4")
    assert(m.durationMs == 5000L)
    assert(m.width == 96 && m.height == 64)
    assert(m.totalFrames == 5)
    assert(m.frameOffsets.toSeq == expOffsets.toSeq,
      s"${m.frameOffsets.toSeq} vs ${expOffsets.toSeq}")
    assert(m.frameSizes.toSeq == expSizes.toSeq)
  }

  test("AVI: avih header + movi chunk scan") {
    val (bytes, sizes) = aviFixture
    val m = MediaContainers.parse(bytes).get
    assert(m.container == "avi")
    assert(m.durationMs == 120L)
    assert(m.width == 32 && m.height == 24)
    assert(m.totalFrames == 3)
    assert(m.frameSizes.toSeq == sizes.toSeq)
    // each offset points at the actual chunk payload
    m.frameOffsets.zip(m.frameSizes).zipWithIndex.foreach {
      case ((off, sz), i) =>
        val data = bytes.slice(off.toInt, off.toInt + sz)
        assert(data.head == (i * 31).toByte)
    }
  }

  test("sampleContainerFrames walks the real MP4 sample table") {
    val (bytes, offsets, sizes) = mp4Fixture
    val assets = Seq((1L, "video"))
      .toDF("asset_id", "kind")
      .withColumn("bytes", org.apache.spark.sql.functions.lit(bytes))
    val frames = Multimodal.sampleContainerFrames(assets, maxFrames = 16)
      .orderBy("frame_idx").collect()
    assert(frames.length == 5)
    frames.zipWithIndex.foreach { case (r, i) =>
      val expected = bytes.slice(offsets(i).toInt, offsets(i).toInt + sizes(i))
      assert(r.getAs[Array[Byte]]("frame").toSeq == expected.toSeq,
        s"frame $i is not the container's sample bytes")
    }
  }

  test("non-container video payloads keep the oracle-pinned byte-slice fallback") {
    val docs = Seq((0L, "a" * 40), (1L, "b" * 300), (2L, "c" * 700),
      (3L, "d" * 5), (5L, "e" * 129)).toDF("doc_id", "text")
    val assets = Multimodal.assetsFrom(docs, "doc_id", "text")
    def render(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .orderBy("asset_id", "frame_idx").collect().map { r =>
        val f = r.getAs[Array[Byte]]("frame")
        val hex = if (f == null) "null" else f.map("%02x".format(_)).mkString
        s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}|$hex"
      }.toSeq
    val a = render(Multimodal.sampleContainerFrames(assets))
    val b = render(Multimodal.sampleFrames(assets))
    assert(a == b, "fallback must be bit-identical to sampleFrames")
  }

  test("containerMeta surfaces parsed metadata, nulls elsewhere") {
    val (mp4, _, _) = mp4Fixture
    val (avi, _) = aviFixture
    val assets = Seq(
      (1L, mp4), (2L, avi), (3L, "not a container".getBytes))
      .toDF("asset_id", "bytes")
    val rows = Multimodal.containerMeta(assets).orderBy("asset_id").collect()
    assert(rows(0).getAs[String]("container") == "mp4")
    assert(rows(0).getAs[Long]("duration_ms") == 5000L)
    assert(rows(1).getAs[String]("container") == "avi")
    assert(rows(1).getAs[Int]("width") == 32)
    assert(rows(2).isNullAt(rows(2).fieldIndex("container")))
  }

  test("malformed containers never throw or hang: truncations and bit flips") {
    val (mp4, _, _) = mp4Fixture
    val (avi, _) = aviFixture
    for (fixture <- Seq(mp4, avi)) {
      // every truncation point
      var t = 0
      while (t < fixture.length) {
        MediaContainers.parse(java.util.Arrays.copyOf(fixture, t))
        t += 1
      }
      // seeded byte-level mutations (sizes, types, offsets, counts)
      val rnd = new scala.util.Random(42)
      for (_ <- 0 until 2000) {
        val mutated = fixture.clone()
        for (_ <- 0 to rnd.nextInt(4)) {
          mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
        }
        MediaContainers.parse(mutated) // must return, Some or None
      }
    }
    // adversarial declared counts: stsz claiming 2^31 samples
    val (bytes, _, _) = mp4Fixture
    val idx = indexOfSlice(bytes, "stsz")
    val huge = bytes.clone()
    System.arraycopy(be32(0x7fffffffL), 0, huge, idx + 12, 4)
    MediaContainers.parse(huge) // capped, not a 2 GiB allocation
  }

  private def indexOfSlice(hay: Array[Byte], needle: String): Int = {
    val n = needle.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    hay.indices.find(i => i + n.length <= hay.length &&
      n.indices.forall(j => hay(i + j) == n(j))).get
  }
}
