package graft.operators

/** Pure-JVM video CONTAINER parsing — no codec required. MP4 box
  * structure (ISO/IEC 14496-12: moov/mvhd/trak/tkhd/stbl with
  * stsz/stsc/stco sample tables) and AVI RIFF headers (avih + movi
  * chunk scan) give true duration, resolution, frame count, and
  * per-frame byte offsets from the raw bytes alone. Frame sampling can
  * then walk the real structure (Multimodal.sampleContainerFrames),
  * and for MJPEG streams the PIXEL payload decodes too — each sample
  * is a standalone JPEG (Multimodal.decodeVideo). Only non-MJPEG
  * codecs still need a decoder the sandbox doesn't ship (reference
  * analog: media ingestion treats stored blobs as opaque — this goes
  * two layers deeper without new dependencies).
  *
  * Every read is bounds-checked and every loop strictly advances, so
  * malformed/adversarial containers (fuzzed in MultimodalSpec) return
  * None rather than throwing or hanging; the frame-table size is
  * capped (`MaxFrames`) so a hostile sample count can't allocate
  * unbounded memory — `totalFrames` still reports the declared count.
  */
object MediaContainers {

  final case class VideoMeta(
      container: String, // "mp4" | "avi"
      durationMs: Long,
      width: Int, height: Int,
      totalFrames: Int,
      frameOffsets: Array[Long],
      frameSizes: Array[Int]) {
    def nFrames: Int = frameOffsets.length
  }

  /** Parsed-frame-table cap: sampling needs a handful of frames; a
    * container declaring 2^31 samples must not allocate them.
    */
  val MaxFrames = 65536

  def looksLikeMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  def looksLikeAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  def parse(b: Array[Byte]): Option[VideoMeta] =
    if (looksLikeMp4(b)) parseMp4(b)
    else if (looksLikeAvi(b)) parseAvi(b)
    else None

  // ---- shared bounds-checked readers ------------------------------

  private def u32be(b: Array[Byte], p: Long): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else ((b(p.toInt) & 0xffL) << 24) | ((b(p.toInt + 1) & 0xffL) << 16) |
      ((b(p.toInt + 2) & 0xffL) << 8) | (b(p.toInt + 3) & 0xffL)

  private def u64be(b: Array[Byte], p: Long): Long =
    if (p < 0 || p + 8 > b.length) -1L
    else (u32be(b, p) << 32) | u32be(b, p + 4)

  private def u32le(b: Array[Byte], p: Long): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else ((b(p.toInt + 3) & 0xffL) << 24) | ((b(p.toInt + 2) & 0xffL) << 16) |
      ((b(p.toInt + 1) & 0xffL) << 8) | (b(p.toInt) & 0xffL)

  private def fourcc(b: Array[Byte], p: Long): String =
    if (p < 0 || p + 4 > b.length) ""
    else new String(b, p.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ---- MP4 --------------------------------------------------------

  /** First child box of `typ` within [from,to): (payloadStart, boxEnd). */
  private def findBox(b: Array[Byte], from: Long, to: Long,
                      typ: String): Option[(Long, Long)] = {
    var p = from
    while (p + 8 <= to) {
      val size0 = u32be(b, p)
      val t = fourcc(b, p + 4)
      var hdr = 8L
      var size = size0
      if (size0 == 1) { size = u64be(b, p + 8); hdr = 16L }
      else if (size0 == 0) size = to - p
      if (size < hdr || p + size > to) return None // malformed: abort
      if (t == typ) return Some((p + hdr, p + size))
      p += size
    }
    None
  }

  /** All child boxes of `typ` within [from,to). */
  private def findBoxes(b: Array[Byte], from: Long, to: Long,
                        typ: String): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var p = from
    var guard = 0
    while (p + 8 <= to && guard < 4096) {
      guard += 1
      val size0 = u32be(b, p)
      val t = fourcc(b, p + 4)
      var hdr = 8L
      var size = size0
      if (size0 == 1) { size = u64be(b, p + 8); hdr = 16L }
      else if (size0 == 0) size = to - p
      if (size < hdr || p + size > to) return out.result()
      if (t == typ) out += ((p + hdr, p + size))
      p += size
    }
    out.result()
  }

  private def path(b: Array[Byte], from: Long, to: Long,
                   names: String*): Option[(Long, Long)] =
    names.foldLeft(Option((from, to))) { (acc, n) =>
      acc.flatMap { case (f, t) => findBox(b, f, t, n) }
    }

  private[operators] def parseMp4(b: Array[Byte]): Option[VideoMeta] = try {
    val (moovS, moovE) = findBox(b, 0, b.length.toLong, "moov").getOrElse(
      return None)
    // mvhd → movie timescale + duration
    val durationMs = findBox(b, moovS, moovE, "mvhd").flatMap {
      case (s, _) =>
        val version = if (s < b.length) b(s.toInt) & 0xff else return None
        val (ts, dur) =
          if (version == 1) (u32be(b, s + 20), u64be(b, s + 24))
          else (u32be(b, s + 12), u32be(b, s + 16))
        if (ts > 0 && dur >= 0) Some(dur * 1000L / ts) else None
    }.getOrElse(return None)

    // the video trak: hdlr == 'vide' (fall back to the first trak)
    val traks = findBoxes(b, moovS, moovE, "trak")
    if (traks.isEmpty) return None
    val vide = traks.find { case (s, e) =>
      path(b, s, e, "mdia", "hdlr").exists { case (hs, _) =>
        fourcc(b, hs + 8) == "vide"
      }
    }.getOrElse(traks.head)
    val (trakS, trakE) = vide

    // tkhd: width/height are the LAST 8 bytes, 16.16 fixed point
    val (w, h) = findBox(b, trakS, trakE, "tkhd").map { case (s, e) =>
      ((u32be(b, e - 8) >> 16).toInt, (u32be(b, e - 4) >> 16).toInt)
    }.getOrElse(return None)

    val (stblS, stblE) = path(b, trakS, trakE, "mdia", "minf", "stbl")
      .getOrElse(return None)

    // stsz: per-sample sizes (or one uniform size)
    val (szS, _) = findBox(b, stblS, stblE, "stsz").getOrElse(return None)
    val uniform = u32be(b, szS + 4)
    val declared = u32be(b, szS + 8)
    if (declared < 0 || declared > Int.MaxValue) return None
    val total = declared.toInt
    val nKeep = math.min(total, MaxFrames)
    val sizes = new Array[Int](nKeep)
    var i = 0
    while (i < nKeep) {
      val s = if (uniform != 0) uniform else u32be(b, szS + 12 + 4L * i)
      if (s < 0) return None
      sizes(i) = s.toInt
      i += 1
    }

    // stco/co64: chunk offsets
    val (chunkOffsets: Array[Long]) =
      findBox(b, stblS, stblE, "stco").map { case (cs, _) =>
        val n = u32be(b, cs + 4)
        if (n < 0 || n > MaxFrames) return None
        Array.tabulate(n.toInt)(j => u32be(b, cs + 8 + 4L * j))
      }.orElse(findBox(b, stblS, stblE, "co64").map { case (cs, _) =>
        val n = u32be(b, cs + 4)
        if (n < 0 || n > MaxFrames) return None
        Array.tabulate(n.toInt)(j => u64be(b, cs + 8 + 8L * j))
      }).getOrElse(return None)
    if (chunkOffsets.exists(_ < 0)) return None

    // stsc: (first_chunk, samples_per_chunk) runs → absolute offsets
    val (scS, _) = findBox(b, stblS, stblE, "stsc").getOrElse(return None)
    val nRuns = u32be(b, scS + 4)
    if (nRuns < 0 || nRuns > MaxFrames) return None
    val runs = Array.tabulate(nRuns.toInt)(j =>
      (u32be(b, scS + 8 + 12L * j), u32be(b, scS + 12 + 12L * j)))
    if (runs.exists(r => r._1 < 1 || r._2 < 0)) return None

    val offsets = new Array[Long](nKeep)
    var sample = 0
    var chunk = 0
    while (sample < nKeep && chunk < chunkOffsets.length) {
      // samples-per-chunk for chunk index (1-based c+1): last run
      // whose first_chunk <= c+1
      val c1 = chunk + 1
      var spc = 1L
      var r = 0
      while (r < runs.length && runs(r)._1 <= c1) { spc = runs(r)._2; r += 1 }
      var inChunk = 0L
      var off = chunkOffsets(chunk)
      while (sample < nKeep && inChunk < spc) {
        offsets(sample) = off
        off += sizes(sample)
        inChunk += 1
        sample += 1
      }
      chunk += 1
    }
    if (sample < nKeep) return None // sample tables inconsistent

    Some(VideoMeta("mp4", durationMs, w, h, total,
      offsets, sizes))
  } catch { case _: Exception => None }

  // ---- AVI --------------------------------------------------------

  private[operators] def parseAvi(b: Array[Byte]): Option[VideoMeta] = try {
    val riffEnd = math.min(8L + u32le(b, 4), b.length.toLong)
    // LIST hdrl → avih: µs/frame, total frames, width, height
    var p = 12L
    var meta: Option[(Long, Int, Int, Int)] = None
    val frameOff = Seq.newBuilder[Long]
    val frameSz = Seq.newBuilder[Int]
    var nFrames = 0
    var guard = 0
    while (p + 8 <= riffEnd && guard < (1 << 20)) {
      guard += 1
      val cc = fourcc(b, p)
      val size = u32le(b, p + 4)
      if (size < 0 || p + 8 + size > riffEnd) return None
      if (cc == "LIST") {
        val listType = fourcc(b, p + 8)
        if (listType == "hdrl") {
          findRiffChunk(b, p + 12, p + 8 + size, "avih").foreach { as =>
            val usPerFrame = u32le(b, as)
            val totalFrames = u32le(b, as + 16)
            val w = u32le(b, as + 32)
            val h = u32le(b, as + 36)
            if (usPerFrame >= 0 && totalFrames >= 0)
              meta = Some((usPerFrame * totalFrames / 1000L,
                w.toInt, h.toInt, totalFrames.toInt))
          }
        } else if (listType == "movi") {
          // video frame chunks: '##dc' (compressed) / '##db' (raw)
          var q = p + 12
          var g2 = 0
          while (q + 8 <= p + 8 + size && g2 < (1 << 20)) {
            g2 += 1
            val fcc = fourcc(b, q)
            val csz = u32le(b, q + 4)
            if (csz < 0 || q + 8 + csz > riffEnd) return None
            if (fcc.length == 4 && fcc(0).isDigit && fcc(1).isDigit &&
              (fcc.endsWith("dc") || fcc.endsWith("db"))) {
              if (nFrames < MaxFrames) {
                frameOff += q + 8
                frameSz += csz.toInt
              }
              nFrames += 1
            }
            q += 8 + csz + (csz & 1) // RIFF chunks are word-aligned
          }
        }
      }
      p += 8 + size + (size & 1)
    }
    meta.map { case (durMs, w, h, declared) =>
      VideoMeta("avi", durMs, w, h, math.max(declared, nFrames),
        frameOff.result().toArray, frameSz.result().toArray)
    }.filter(_.nFrames > 0)
  } catch { case _: Exception => None }

  private def findRiffChunk(b: Array[Byte], from: Long, to: Long,
                            cc: String): Option[Long] = {
    var p = from
    var guard = 0
    while (p + 8 <= to && guard < 4096) {
      guard += 1
      val t = fourcc(b, p)
      val size = u32le(b, p + 4)
      if (size < 0 || p + 8 + size > to) return None
      if (t == cc) return Some(p + 8)
      p += 8 + size + (size & 1)
    }
    None
  }
}
