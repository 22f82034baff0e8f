package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode / feature /
  * frame-sample operators.
  *
  * The Spark-side contract — schema, partition-preserving mapPartitions,
  * per-batch processing shape, explode semantics for frames — is real
  * and tested. The IMAGE and AUDIO decode paths are real too: payloads
  * whose magic bytes identify a JDK-decodable format go through the
  * stock JDK codecs — PNG/JPEG/BMP/GIF via `javax.imageio` (features
  * and resizes from actual pixels), WAV/PCM via `javax.sound.sampled`
  * (amplitude features from actual samples). VIDEO pixels are real for
  * MJPEG containers (`decodeVideo`: every MJPEG sample is a standalone
  * JPEG, so container parse + `javax.imageio` covers the whole path in
  * pure JVM). Everything else (non-MJPEG video, compressed audio,
  * undecodable bytes — the sandbox has no external codecs) falls back
  * to `fakeDecode`, a clearly-marked deterministic
  * stand-in that derives stable pseudo-features from the raw bytes. On
  * a real cluster, swap the fallback for a JNI/javacv decoder — the
  * operator shape (iterator→iterator over partitions, fixed-length
  * float features) is exactly what it needs.
  *
  * Scale note: the magic sniff is a 4-byte check, so the common case
  * of a non-image payload never pays `ImageIO`'s reader-discovery
  * cost, and `ImageIO.setUseCache(false)` keeps decode entirely
  * in-memory (no per-call temp files on executor disks).
  */
object Multimodal {

  /** 4-byte magic sniff for the formats the stock JDK can decode.
    * Cheap gate so non-image payloads (the overwhelming majority of a
    * mixed corpus) skip ImageIO entirely.
    */
  private[operators] def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))

  /** Real image decode via the JDK's built-in readers: returns
    * (width, height, 8-bin luminance histogram over actual pixels),
    * or None when the payload doesn't decode (caller falls back to
    * `fakeDecode`). Bulk `getRGB` — one array copy, no per-pixel JNI.
    */
  private[operators] def decodeImage(
      bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    if (!looksLikeImage(bytes)) None
    else try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val bins = new Array[Float](8)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          // integer Rec.601 luma, 0..255 → 8 bins of 32
          val lum = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
            (p & 0xff) * 114) / 1000
          bins(lum >>> 5) += 1f
          i += 1
        }
        var b = 0
        while (b < 8) { bins(b) /= px.length; b += 1 }
        Some((w, h, bins))
      }
    } catch { case _: Exception => None }

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_bytes", LongType))))))

  /** Deterministic asset table derived from any (id, text) frame —
    * stands in for a real binary corpus; kind cycles image/audio/video.
    */
  /** Modality of the synthetic asset paired with an id (cycles
    * image/audio/video — the shared derivation for every operator
    * that needs a kind without materializing the asset table).
    */
  def kindOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(id, lit(3)) + 1).cast("int"))

  def assetsFrom(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bytes = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).cast("long").as("asset_id"),
      kindOf(col(idCol)).as("kind"),
      bytes.as("bytes"),
      struct(
        (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        length(col(textCol)).cast("long").as("n_bytes")).as("meta"))
  }

  /** Interleaved multimodal sequence packing — the VLM-pretraining
    * layout: each document occupies its text tokens PLUS a fixed
    * per-modality patch/frame budget for its paired asset (image
    * patches, audio frames, video tiles), and the combined stream is
    * concat-and-chunked into training sequences exactly like the
    * text-only path (Sampling.packSequences — per-shard deterministic
    * order, documents straddle boundaries).
    *
    * Everything is integer arithmetic over metadata; the asset bytes
    * themselves never move. Per doc: (idCol, kind, n_text_tokens,
    * n_asset_tokens, shard, seq_first, seq_last, seq_offset).
    */
  def packInterleaved(docs: DataFrame, idCol: String, textCol: String,
                      seqLen: Long = 4096, nShards: Int = 8,
                      imageTokens: Int = 256, audioTokens: Int = 128,
                      videoTokens: Int = 1024): DataFrame = {
    val assetCost = when(col("kind") === "image", imageTokens)
      .when(col("kind") === "audio", audioTokens)
      .otherwise(videoTokens)
    // kind is a pure function of the id (kindOf) — deriving it inline
    // keeps this a single map-side projection, not a self-join with
    // the asset table
    val costed = docs
      .select(col(idCol), kindOf(col(idCol)).as("kind"),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("n_text_tokens"))
      .select(col(idCol), col("kind"), col("n_text_tokens"),
        assetCost.cast("long").as("n_asset_tokens"),
        (col("n_text_tokens") + assetCost).as("__cost"))
    Sampling.packSequences(costed, idCol, "__cost", seqLen, nShards,
      carryCols = Seq("kind", "n_text_tokens", "n_asset_tokens"))
  }

  /** RIFF/WAVE magic sniff — the audio format the stock JDK can parse
    * (`javax.sound.sampled`); like [[looksLikeImage]], a cheap gate so
    * non-audio payloads never pay AudioSystem's provider discovery.
    */
  private[operators] def looksLikeWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Real audio decode for WAV/PCM via the JDK's built-in parser:
    * returns (sampleRate, 8-bin histogram of |amplitude| over actual
    * samples, channel-interleaved, normalized to [0,1]), or None when
    * the payload doesn't parse or uses an encoding the stock JDK can't
    * deliver as 8/16-bit PCM (caller falls back to `fakeDecode`).
    */
  private[operators] def decodeAudio(
      bytes: Array[Byte]): Option[(Int, Array[Float])] =
    if (!looksLikeWav(bytes)) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val pcm = ais.readAllBytes()
      ais.close()
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val bins = new Array[Float](8)
      var n = 0
      if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        bits == 16 && !fmt.isBigEndian) {
        var i = 0
        while (i + 1 < pcm.length) {
          val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
          // |amplitude| in [0,1] → 8 equal bins (32768/8 = 4096/sample)
          bins(math.min(math.abs(s.toInt), 32767) >>> 12) += 1f
          i += 2; n += 1
        }
      } else if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
        bits == 8) {
        var i = 0
        while (i < pcm.length) {
          bins(math.min(math.abs((pcm(i) & 0xff) - 128) * 256, 32767) >>> 12) += 1f
          i += 1; n += 1
        }
      } else return None
      if (n == 0) return None
      var b = 0
      while (b < 8) { bins(b) /= n; b += 1 }
      Some((math.round(fmt.getSampleRate), bins))
    } catch { case _: Exception => None }

  /** FALLBACK decode for payloads the JDK can't read (video — no
    * codecs in this sandbox — non-WAV audio, and corrupt media): 8-bin byte histogram
    * normalized to [0,1] — stable, content-derived, shaped exactly like
    * the real path's luminance histogram. Replace with a JNI/javacv
    * codec at deployment; everything around it stays.
    */
  private[operators] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    if (bytes == null || bytes.isEmpty) return bins
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) >>> 5) += 1f
      i += 1
    }
    var b = 0
    while (b < 8) { bins(b) /= bytes.length; b += 1 }
    bins
  }

  /** Real VIDEO pixel decode for the one codec-in-container family the
    * stock JDK handles end-to-end: MJPEG. Every sample in an MJPEG
    * stream is a standalone JPEG, so once [[MediaContainers]] yields
    * the container's true frame table (AVI `##dc` chunks or an MP4
    * sample table), `javax.imageio` decodes actual pixels with no
    * external codec. Samples up to `maxFrames` evenly-spaced frames
    * and returns (width, height, framesDecoded, frame-averaged 8-bin
    * luminance histogram) — dims are the FIRST decoded frame's (the
    * stream's nominal geometry; a mixed-dimension container would
    * otherwise report whichever sampled frame decoded last); None
    * when the payload isn't a parseable
    * container or no sampled frame decodes as an image (caller falls
    * back to `fakeDecode`). Non-MJPEG codecs (H.264 etc.) land on the
    * None path by construction — their samples aren't JPEGs.
    */
  private[operators] def decodeVideo(bytes: Array[Byte], maxFrames: Int = 8)
      : Option[(Int, Int, Int, Array[Float])] =
    MediaContainers.parse(bytes).flatMap { m =>
      if (m.nFrames <= 0) None
      else {
        val n = math.min(m.nFrames, maxFrames)
        var w = 0
        var h = 0
        var decoded = 0
        val acc = new Array[Float](8)
        var i = 0
        while (i < n) {
          val j = (i.toLong * m.nFrames / n).toInt // even spread
          val off = m.frameOffsets(j)
          val sz = m.frameSizes(j).toLong
          if (off >= 0 && sz > 0 && off + sz <= bytes.length) {
            val frame = java.util.Arrays.copyOfRange(
              bytes, off.toInt, (off + sz).toInt)
            decodeImage(frame) match {
              case Some((fw, fh, feats)) =>
                if (decoded == 0) { w = fw; h = fh }
                decoded += 1
                var b = 0
                while (b < 8) { acc(b) += feats(b); b += 1 }
              case None => ()
            }
          }
          i += 1
        }
        if (decoded == 0) None
        else {
          var b = 0
          while (b < 8) { acc(b) /= decoded; b += 1 }
          Some((w, h, decoded, acc))
        }
      }
    }

  /** Batch feature extraction: partition-parallel iterator→iterator
    * (the Scala analog of mapInPandas batches — no per-row task or
    * driver round-trip; codec init amortizes per partition). Payloads
    * with a decodable image magic are decoded for real (`decodeImage`:
    * actual pixel luminance histogram + true width/height), WAV audio
    * likewise (`decodeAudio`: amplitude histogram + true sample rate),
    * and MJPEG video too (`decodeVideo`: frame-averaged pixel luminance
    * histogram + true frame dimensions); everything else takes the
    * byte-histogram fallback with null dims/rate. All real paths emit
    * the same 8-float feature shape as the fallback, so downstream
    * consumers are agnostic to which path produced a row.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "kind", "bytes").mapPartitions { rows =>
      // per-partition init happens HERE (codec handles, model weights…)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val n = if (bytes == null) 0L else bytes.length.toLong
        decodeImage(bytes) match {
          case Some((w, h, feats)) =>
            Row(r.getLong(0), r.getString(1), n, w, h, null, feats.toSeq)
          case None => decodeAudio(bytes) match {
            case Some((rate, feats)) =>
              Row(r.getLong(0), r.getString(1), n, null, null, rate,
                feats.toSeq)
            case None => decodeVideo(bytes) match {
              case Some((w, h, _, feats)) =>
                Row(r.getLong(0), r.getString(1), n, w, h, null,
                  feats.toSeq)
              case None =>
                Row(r.getLong(0), r.getString(1), n, null, null, null,
                  fakeDecode(bytes).toSeq)
            }
          }
        }
      }
    }(enc)
  }

  /** Resize plumbing: rewrites target dimensions in the typed metadata
    * and produces a proportionally subsampled payload (every k-th byte
    * — the STUB stand-in for a real scaler; see fakeDecode). The parts
    * that survive a real codec swap: metadata contract, deterministic
    * output size, pure column-level operation (no driver round trip).
    */
  def resize(assets: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val origPixels = col("meta.width") * col("meta.height")
    val targetPixels = lit(targetW) * lit(targetH)
    val keepRatio = least(targetPixels.cast("double") / origPixels, lit(1.0))
    assets
      // materialize the target length BEFORE overwriting bytes — the
      // expression references length(bytes), which must mean the
      // ORIGINAL payload in both consumers
      .withColumn("__new_len",
        greatest((length(col("bytes")) * keepRatio).cast("int"), lit(1)))
      .withColumn("bytes", col("bytes").substr(lit(1), col("__new_len")))
      .withColumn("meta", struct(
        lit(targetW).as("width"), lit(targetH).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("__new_len").cast("long").as("n_bytes")))
      .drop("__new_len")
  }

  /** Resize with a REAL image path: payloads with a decodable magic are
    * decoded via `javax.imageio`, scaled to (targetW, targetH) with
    * bilinear interpolation, and re-encoded as PNG; everything else
    * gets exactly the `resize` fallback semantics (proportional byte
    * subsample — keepRatio = min(targetPixels/origPixels, 1), payload
    * truncated to max(len·ratio, 1) bytes). Same asset schema out, so
    * the two paths compose into one corpus. Partition-parallel
    * iterator→iterator; the asset bytes never visit the driver.
    */
  def resizeImages(spark: SparkSession, assets: DataFrame,
                   targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(assetSchema)
    assets.select("asset_id", "kind", "bytes", "meta").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val meta = r.getStruct(3)
        val sampleRate = if (meta.isNullAt(2)) null else meta.get(2)
        val real: Option[Row] =
          if (!looksLikeImage(bytes)) None
          else try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              val out = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, targetW, targetH, null)
              g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", baos)
              val newBytes = baos.toByteArray
              Some(Row(r.getLong(0), r.getString(1), newBytes,
                Row(targetW, targetH, sampleRate, newBytes.length.toLong)))
            }
          } catch { case _: Exception => None }
        real.getOrElse {
          // opaque-payload fallback — MUST stay bit-identical to
          // `resize` (the m03 oracle pins this formula). Null width/
          // height behave like the column-expression form's
          // null-skipping least(): keepRatio = 1.0; null bytes stay
          // null rather than becoming an empty array.
          val keepRatio =
            if (meta.isNullAt(0) || meta.isNullAt(1)) 1.0
            else {
              val origPixels = meta.getInt(0).toLong * meta.getInt(1)
              if (origPixels <= 0) 1.0
              else math.min(targetW.toLong * targetH / origPixels.toDouble, 1.0)
            }
          val len = if (bytes == null) 0 else bytes.length
          val newLen = math.max((len * keepRatio).toInt, 1)
          val newBytes =
            if (bytes == null) null
            else java.util.Arrays.copyOfRange(bytes, 0, math.min(newLen, len))
          Row(r.getLong(0), r.getString(1), newBytes,
            Row(targetW, targetH, sampleRate, newLen.toLong))
        }
      }
    }(enc)
  }

  /** Frame sampling for `video` assets: every `frameBytes` slice becomes
    * a (asset_id, frame_idx, frame) row — pure explode, no driver loop;
    * non-video assets pass through as a single frame 0.
    */
  /** Container-aware frame sampling: video payloads whose bytes parse
    * as a real MP4/AVI container ([[MediaContainers]] — pure JVM, no
    * codec) are sampled along the container's ACTUAL sample table
    * (true frame offsets/sizes, up to `maxFrames` evenly spaced over
    * the declared frames); everything else takes the byte-slice
    * fallback BIT-IDENTICAL to [[sampleFrames]] (the m02 oracle pins
    * that formula, and the synthetic corpus has no real containers).
    * Same output schema as sampleFrames, so it's a drop-in.
    */
  def sampleContainerFrames(assets: DataFrame, frameBytes: Int = 64,
                            maxFrames: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "kind", "bytes").mapPartitions { rows =>
      def slice(b: Array[Byte], from: Long, len: Long): Array[Byte] = {
        if (b == null) return null
        val s = math.min(math.max(from, 0L), b.length.toLong).toInt
        val e = math.min(s + math.max(len, 0L), b.length.toLong).toInt
        java.util.Arrays.copyOfRange(b, s, e)
      }
      // bit-identical to sampleFrames' column formula (oracle-pinned):
      // n = min(max(ceil(len/frameBytes),1), maxFrames); greatest()
      // skips the null length, so null bytes still emit frame 0
      def fallback(b: Array[Byte]): Iterator[(Int, Array[Byte])] = {
        val n = if (b == null) 1
          else math.min(math.max(
            (b.length + frameBytes - 1) / frameBytes, 1), maxFrames)
        (0 until n).iterator.map(i =>
          (i, if (b == null) null
              else slice(b, i.toLong * frameBytes, frameBytes)))
      }
      rows.flatMap { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]]("bytes")
        val frames: Iterator[(Int, Array[Byte])] =
          if (kind != "video")
            Iterator.single((0,
              if (bytes == null) null else slice(bytes, 0, frameBytes)))
          else MediaContainers.parse(bytes) match {
            case Some(m) if m.nFrames > 0 =>
              val n = math.min(m.nFrames, maxFrames)
              (0 until n).iterator.map { i =>
                val j = (i.toLong * m.nFrames / n).toInt // even spread
                (i, slice(bytes, m.frameOffsets(j), m.frameSizes(j).toLong))
              }
            case _ => fallback(bytes)
          }
        frames.map { case (i, f) => Row(id, kind, i, f) }
      }
    }(enc)
  }

  /** Per-frame pixel features: container-aware frame sampling composed
    * with real per-frame decode. Each sampled frame becomes
    * (asset_id, kind, frame_idx, width, height, features, decoded) —
    * MJPEG frames (standalone JPEGs) decode to true dimensions and a
    * pixel luminance histogram with decoded=true; anything else (raw
    * `##db` frames, non-MJPEG codecs, fallback byte slices) gets the
    * byte-histogram stand-in with decoded=false, so the row shape is
    * uniform across codecs and consumers can filter on the flag.
    * Two narrow partition-parallel stages, no shuffle; frame bytes
    * never visit the driver.
    */
  def videoFrameFeatures(assets: DataFrame, frameBytes: Int = 64,
                         maxFrames: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType)),
      StructField("decoded", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    sampleContainerFrames(assets, frameBytes, maxFrames).mapPartitions {
      rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          // positional access: Catalyst elides the serialize/
          // deserialize pair between back-to-back mapPartitions, so
          // these rows can arrive as schema-less GenericRows
          val frame = r.getAs[Array[Byte]](3)
          decodeImage(frame) match {
            case Some((w, h, feats)) =>
              Row(r.getLong(0), r.getString(1), r.getInt(2), w, h,
                feats.toSeq, true)
            case None =>
              Row(r.getLong(0), r.getString(1), r.getInt(2), null, null,
                fakeDecode(frame).toSeq, false)
          }
        }
    }(enc)
  }

  /** True container metadata for video assets — duration, resolution,
    * declared frame count from MP4 boxes / AVI headers; null columns
    * when the payload isn't a parseable container.
    */
  def containerMeta(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("container", StringType),
      StructField("duration_ms", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("total_frames", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        MediaContainers.parse(r.getAs[Array[Byte]]("bytes")) match {
          case Some(m) => Row(r.getLong(0), m.container, m.durationMs,
            m.width, m.height, m.totalFrames)
          case None => Row(r.getLong(0), null, null, null, null, null)
        }
      }
    }(enc)
  }

  def sampleFrames(assets: DataFrame, frameBytes: Int = 64,
                   maxFrames: Int = 16): DataFrame = {
    val nFrames = least(
      greatest(ceil(length(col("bytes")).cast("double") / frameBytes), lit(1))
        .cast("int"),
      lit(maxFrames))
    assets
      .withColumn("frame_idx", explode(
        when(col("kind") === "video", sequence(lit(0), nFrames - 1))
          .otherwise(array(lit(0)))))
      .withColumn("frame",
        col("bytes").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select("asset_id", "kind", "frame_idx", "frame")
  }
}
