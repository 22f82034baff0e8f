package graft.operators

/** Shared builders for REAL media containers used across the media
  * specs: parametric MJPEG-in-AVI and MJPEG-in-MP4 files whose frame
  * payloads are genuine JPEGs (encoded via `javax.imageio`), so the
  * pixel-decode path can be exercised end-to-end with no binary
  * fixtures checked in. Layouts follow the same public structure
  * MediaContainers parses: ISO/IEC 14496-12 box trees and AVI RIFF
  * (`avih` header + `movi` chunk list).
  */
object MediaFixtures {

  def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ ascii(typ) ++ body
  }

  /** A w×h solid-color frame encoded as a real JPEG. */
  def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** MJPEG-in-AVI: `avih` header (declared dims/frame count/rate) +
    * one `00dc` chunk per frame payload inside LIST movi.
    */
  def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
               usPerFrame: Long = 40000L): Array[Byte] = {
    // avih payload (56 bytes): usPerFrame@0, totalFrames@16,
    // width@32, height@36 — the fields the parser reads
    val avihPayload = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ new Array[Byte](16)
    val avih = ascii("avih") ++ le32(avihPayload.length) ++ avihPayload
    val hdrl = ascii("LIST") ++ le32(4L + avih.length) ++
      ascii("hdrl") ++ avih
    val frameChunks = frames.toArray.flatMap { f =>
      ascii("00dc") ++ le32(f.length) ++ f ++
        (if (f.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    }
    val movi = ascii("LIST") ++ le32(4L + frameChunks.length) ++
      ascii("movi") ++ frameChunks
    val body = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  /** MJPEG-in-MP4: real box tree (moov/trak/mdia/minf/stbl with
    * stsz/stsc/stco sample tables) over one mdat chunk of
    * concatenated JPEG samples; movie timescale 1000 so duration is
    * `frames × msPerFrame` ms.
    */
  def mjpegMp4(frames: Seq[Array[Byte]], w: Int, h: Int,
               msPerFrame: Long = 40L): Array[Byte] = {
    val ftyp = mp4Box("ftyp", ascii("isom"), be32(512), ascii("isomiso2"))
    // v0 mvhd: timescale@12, duration@16 of the payload
    val mvhd = mp4Box("mvhd", new Array[Byte](4), be32(0), be32(0),
      be32(1000), be32(msPerFrame * frames.length))
    // tkhd: width/height are the last 8 payload bytes, 16.16 fixed
    val tkhd = mp4Box("tkhd", new Array[Byte](76),
      be32(w.toLong << 16), be32(h.toLong << 16))
    // hdlr: handler type 'vide' at payload offset 8
    val hdlr = mp4Box("hdlr", new Array[Byte](8), ascii("vide"),
      new Array[Byte](12))
    val stsz = mp4Box("stsz", new Array[Byte](4), be32(0),
      be32(frames.length),
      frames.toArray.flatMap(f => be32(f.length)))
    val stsc = mp4Box("stsc", new Array[Byte](4), be32(1),
      be32(1), be32(frames.length), be32(1))
    def whole(chunkOff: Long): Array[Byte] = {
      val stco = mp4Box("stco", new Array[Byte](4), be32(1), be32(chunkOff))
      val stbl = mp4Box("stbl", stsz, stsc, stco)
      val minf = mp4Box("minf", stbl)
      val mdia = mp4Box("mdia", hdlr, minf)
      val trak = mp4Box("trak", tkhd, mdia)
      val moov = mp4Box("moov", mvhd, trak)
      ftyp ++ moov
    }
    // two passes: the chunk offset depends on the header length
    val headerLen = whole(0L).length + 8 // + mdat box header
    whole(headerLen.toLong) ++ mp4Box("mdat", frames.toArray.flatten)
  }
}
