package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media travels as opaque `BinaryType` columns next to a typed
  * metadata struct; per-item compute (decode, feature-extract, resize,
  * frame-sample) runs as scalar/partition functions so any codec drops in
  * without changing the plan shape.
  *
  * Two decode tiers:
  *  - REAL (`withImageMeta(real = true)`, [[resize]], [[extractPixelFeatures]]):
  *    JDK `javax.imageio` — PNG/JPEG/GIF/BMP decode, resize and pixel
  *    features with zero external dependencies. Oracle-gated end to end by
  *    q71 (generated PNGs whose true dimensions the SQL oracle states as
  *    closed-form values) and spec-tested on generated images.
  *  - FAKE (`withImageMeta` default): deterministic header-sniff +
  *    length-derived dimensions — a TEST HELPER kept for plumbing tests
  *    whose oracle must derive dimensions from plain SQL over text
  *    length (q33); never the real decode path.
  *
  * Audio is REAL too: [[withAudioMeta]] / [[extractAudioFeatures]] decode
  * WAV/AIFF/AU PCM through `javax.sound.sampled` (in every JRE), oracle-
  * gated by q75 on generated WAVs with closed-form header values. Video
  * codecs are genuinely absent from the container, so frame sampling
  * remains plumbing-only.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("size_bytes", LongType)))

  /** STUB decode — deterministic fake. Real implementation: decode the
    * compressed bytes with a codec (e.g. TwelveMonkeys/javacv) and return
    * true dimensions. The fake derives dimensions from content length so an
    * external oracle can reproduce it. */
  private def fakeDecode(bytes: Array[Byte]): (String, Int, Int, Int) = {
    val fmt =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "png"
      else "raw"
    val w = 64 + (bytes.length * 7) % 1024
    val ht = 64 + (bytes.length * 13) % 1024
    (fmt, w, ht, 3)
  }

  val decodeImageMetaU = udf((b: Array[Byte]) =>
    if (b == null) None
    else {
      val (fmt, w, h, c) = fakeDecode(b)
      Some((fmt, w, h, c, b.length.toLong))
    })

  /** REAL decode via JDK ImageIO: format from the registered reader,
    * dimensions and channel count from the decoded raster. Null for bytes
    * no reader accepts. */
  val decodeImageRealU = udf((b: Array[Byte]) =>
    if (b == null) None
    else decodeReal(b).map { case (fmt, img) =>
      (fmt, img.getWidth, img.getHeight, img.getColorModel.getNumComponents, b.length.toLong)
    })

  private def decodeReal(b: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getFormatName.toLowerCase, r.read(0)))
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally iis.close()
  }

  /** Attach an image-metadata struct column. `real = true` uses the JDK
    * ImageIO decoder; default keeps the oracle-reproducible sniff. */
  def withImageMeta(df: DataFrame, binCol: String, metaCol: String = "image_meta",
                    real: Boolean = false): DataFrame = {
    val u = if (real) decodeImageRealU else decodeImageMetaU
    df.withColumn(metaCol, u(col(binCol)))
      .withColumn(metaCol, struct(
        col(s"$metaCol._1").as("format"), col(s"$metaCol._2").as("width"),
        col(s"$metaCol._3").as("height"), col(s"$metaCol._4").as("channels"),
        col(s"$metaCol._5").as("size_bytes")))
  }

  /** REAL resize: decode, scale with bilinear Graphics2D, re-encode as PNG.
    * Undecodable rows pass through as null. */
  def resize(df: DataFrame, binCol: String, targetW: Int, targetH: Int,
             outCol: String = "resized"): DataFrame = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) null
      else decodeReal(b).map { case (_, img) =>
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img, 0, 0, targetW, targetH, null)
        g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }.orNull)
    df.withColumn(outCol, u(col(binCol)))
  }

  /** REAL pixel features: decode, average RGB over a grid×grid partition of
    * the image → 3·grid² floats, L2-normalized — a deterministic baseline
    * embedding a vision encoder would replace. */
  def extractPixelFeatures(df: DataFrame, binCol: String, grid: Int = 4,
                           outCol: String = "pixel_features"): DataFrame = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) null
      else decodeReal(b).map { case (_, img) =>
        val out = new Array[Float](3 * grid * grid)
        val counts = new Array[Int](grid * grid)
        val w = img.getWidth
        val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val cell = math.min(grid - 1, y * grid / h) * grid + math.min(grid - 1, x * grid / w)
            val rgb = img.getRGB(x, y)
            out(3 * cell) += ((rgb >> 16) & 0xff) / 255.0f
            out(3 * cell + 1) += ((rgb >> 8) & 0xff) / 255.0f
            out(3 * cell + 2) += (rgb & 0xff) / 255.0f
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        var c = 0
        while (c < grid * grid) {
          if (counts(c) > 0) {
            out(3 * c) /= counts(c); out(3 * c + 1) /= counts(c); out(3 * c + 2) /= counts(c)
          }
          c += 1
        }
        val norm = math.sqrt(out.map(v => v.toDouble * v).sum).toFloat
        if (norm > 0) out.map(_ / norm) else out
      }.orNull)
    df.withColumn(outCol, u(col(binCol)))
  }

  /** 64-bit DCT perceptual hash (the classic pHash construction): decode,
    * area-average to 32×32 grayscale (own deterministic loop — no
    * Graphics2D, whose interpolation is implementation-defined), 2-D DCT-II,
    * keep the top-left 8×8 low-frequency block, threshold each coefficient
    * against the mean of the other 63 (DC excluded) → 16 lowercase hex
    * chars, [[graft.functions.TextFunctions.simhash64]]-shaped so
    * [[Dedup.hammingPairs]] bands it directly. Near-identical images (crop
    * noise, re-encode, light edits) land within a few bits; unrelated
    * images are ~32 bits apart. NULL for undecodable bytes. */
  def pHash64(df: DataFrame, binCol: String, outCol: String = "phash"): DataFrame = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) null else decodeReal(b).map { case (_, img) => phashOf(img) }.orNull)
    df.withColumn(outCol, u(col(binCol)))
  }

  /** Deterministic 40×40 block-noise PNG for pattern class `c` — the q130
    * fixture generator, shared with the spec that pins the cross-class
    * hash margin. Each 5×5 cell's luminance comes from an integer hash of
    * (cell, class), giving broadband spectra well separated across
    * classes (measured ≥ 20 bits pairwise). */
  def classPatternPng(c: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(40, 40, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 40) {
      var x = 0
      while (x < 40) {
        val h = (x / 5) * 73856093 ^ (y / 5) * 19349663 ^ c * 83492791
        val m = h * 0x9e3775cd
        val lum = if (((m >>> 16) & 1) == 1) 255 else 0
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[graft] def phashOf(img: java.awt.image.BufferedImage): String = {
    val n = 32
    // area-average luminance downsample (deterministic double math)
    val g = Array.ofDim[Double](n, n)
    val cnt = Array.ofDim[Int](n, n)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      val cy = math.min(n - 1, y * n / h)
      var x = 0
      while (x < w) {
        val cx = math.min(n - 1, x * n / w)
        val rgb = img.getRGB(x, y)
        g(cy)(cx) += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        cnt(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) { if (cnt(i)(j) > 0) g(i)(j) /= cnt(i)(j); j += 1 }
      i += 1
    }
    // top-left 8x8 of the 2-D DCT-II (direct O(64·n²) evaluation)
    val k = 8
    val coef = Array.ofDim[Double](k, k)
    var u0 = 0
    while (u0 < k) {
      var v0 = 0
      while (v0 < k) {
        var s = 0.0
        var yy = 0
        while (yy < n) {
          val cu = math.cos(math.Pi * (2 * yy + 1) * u0 / (2.0 * n))
          var xx = 0
          while (xx < n) {
            s += g(yy)(xx) * cu * math.cos(math.Pi * (2 * xx + 1) * v0 / (2.0 * n))
            xx += 1
          }
          yy += 1
        }
        coef(u0)(v0) = s
        v0 += 1
      }
      u0 += 1
    }
    val mean = (coef.map(_.sum).sum - coef(0)(0)) / 63.0
    var bits = 0L
    var idx = 0
    var a = 0
    while (a < k) {
      var b2 = 0
      while (b2 < k) {
        // DC (0,0) is excluded from the mean AND from the signature (bit 0
        // is a fixed 0, the classic pHash construction): DC ~ the image's
        // total luminance always exceeds the AC mean, so emitting it would
        // spend a signature bit on a constant — 63 discriminating AC bits
        // are what the hamming comparisons actually see either way
        if ((a != 0 || b2 != 0) && coef(a)(b2) > mean) bits |= (1L << (63 - idx))
        idx += 1
        b2 += 1
      }
      a += 1
    }
    f"$bits%016x"
  }

  // ---- audio (REAL decode via JDK javax.sound.sampled — WAV/AIFF/AU PCM) --

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("frames", LongType),
    StructField("duration_ms", DoubleType),
    StructField("size_bytes", LongType)))

  /** RIFF/WAVE header fields parsed directly from the chunk list — the
    * same values `AudioSystem.getAudioFileFormat` reports for a WAV (pinned
    * by MultimodalSpec), without its cost: every AudioSystem entry point
    * funnels through a GLOBAL synchronized provider registry
    * (`JDK13Services.getProviders`), and at one lookup per row 32 executor
    * threads serialize on that lock — the suite soak flagged q75 at 7.8×
    * for a 4× replication from exactly this. frames = data size /
    * blockAlign, the JDK's own rule. Returns None for anything that is not
    * a well-formed PCM-family RIFF so the caller can fall back. */
  private def riffWaveMeta(b: Array[Byte]): Option[(String, Int, Int, Int, Long, Double, Long)] = {
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int) = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtOff = -1
    var dataLen = -1L
    while (off + 8 <= b.length && (fmtOff < 0 || dataLen < 0)) {
      val id = tag(off); val len = u32(off + 4)
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") dataLen = math.min(len, (b.length - off - 8).toLong)
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (fmtOff < 0 || dataLen < 0) return None
    val codec = u16(fmtOff)
    if (codec != 1 && codec != 6 && codec != 7) return None // PCM/alaw/ulaw only — else fall back
    val channels = u16(fmtOff + 2)
    val rate = u32(fmtOff + 4).toInt
    val blockAlign = u16(fmtOff + 12)
    val bits = u16(fmtOff + 14)
    if (channels <= 0 || rate <= 0 || blockAlign <= 0) return None
    val frames = dataLen / blockAlign
    Some(("wave", rate, channels, bits, frames, frames * 1000.0 / rate, b.length.toLong))
  }

  /** REAL audio decode: WAV headers are parsed directly from the RIFF
    * chunks (identical fields, no global provider lock — see
    * [[riffWaveMeta]]); everything else (AIFF/AU, compressed codecs via
    * SPI) goes through the JDK sampled-sound stack. Null for bytes no
    * parser accepts. */
  val decodeAudioRealU = udf((b: Array[Byte]) =>
    if (b == null) None
    else riffWaveMeta(b).orElse(
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(b))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        Some((aff.getType.toString.toLowerCase,
          math.round(fmt.getSampleRate).toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, frames,
          frames * 1000.0 / fmt.getSampleRate, b.length.toLong))
      } catch { case _: Exception => None }))

  /** Attach an audio-metadata struct column (always the real JDK decoder —
    * unlike images there is no fake tier; WAV parsing needs no external
    * codec). */
  def withAudioMeta(df: DataFrame, binCol: String, metaCol: String = "audio_meta"): DataFrame =
    df.withColumn(metaCol, decodeAudioRealU(col(binCol)))
      .withColumn(metaCol, struct(
        col(s"$metaCol._1").as("format"), col(s"$metaCol._2").as("sample_rate"),
        col(s"$metaCol._3").as("channels"), col(s"$metaCol._4").as("bits"),
        col(s"$metaCol._5").as("frames"), col(s"$metaCol._6").as("duration_ms"),
        col(s"$metaCol._7").as("size_bytes")))

  /** REAL audio features: decode to PCM, mix channels down, and emit
    * `windows` per-window RMS values + overall peak + zero-crossing rate —
    * the deterministic baseline an audio encoder would replace. Output
    * length is `windows + 2`; null for undecodable rows. */
  def extractAudioFeatures(df: DataFrame, binCol: String, windows: Int = 8,
                           outCol: String = "audio_features"): DataFrame = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) null
      else
        decodeMono(b) match {
          case None => null
          case Some(mono) =>
            val n = mono.length
            val out = new Array[Float](windows + 2)
            val counts = new Array[Int](windows)
            var peak = 0.0
            var zc = 0
            var i = 0
            while (i < n) {
              val w = math.min(windows - 1, i * windows / n)
              out(w) = out(w) + (mono(i) * mono(i)).toFloat
              counts(w) += 1
              val a = math.abs(mono(i)); if (a > peak) peak = a
              if (i > 0 && (mono(i) >= 0) != (mono(i - 1) >= 0)) zc += 1
              i += 1
            }
            var w = 0
            while (w < windows) {
              if (counts(w) > 0) out(w) = math.sqrt(out(w) / counts(w)).toFloat
              w += 1
            }
            out(windows) = peak.toFloat
            out(windows + 1) = zc.toFloat / n
            out
        })
    df.withColumn(outCol, u(col(binCol)))
  }

  /** Deterministic 8 kHz 16-bit mono WAV for envelope class `c` — the q132
    * fixture generator, shared with the spec that pins the cross-class
    * fingerprint margin. 1300 frames = 65 fingerprint windows of 20
    * frames; each window plays a 440 Hz tone either loud (0.6) or quiet
    * (0.05) from an integer hash of (window, class), giving envelope
    * shapes well separated across classes. Hand-assembled canonical PCM
    * header (no AudioSystem writer — its global provider lock serializes
    * executor threads; the q75 lesson). */
  def classToneWav(c: Int): Array[Byte] = {
    val rate = 8000
    val nframes = 1300
    val dataLen = nframes * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nframes) {
      val w = i / 20
      val h = (w * 73856093 ^ c * 83492791) * 0x9e3775cd
      val amp = if (((h >>> 16) & 1) == 1) 0.6 else 0.05
      bb.putShort((math.sin(2 * math.Pi * 440.0 * i / rate) * amp * 32767).toInt.toShort)
      i += 1
    }
    bb.array()
  }

  /** Decode any JDK-supported audio container to mono [-1, 1] doubles
    * (16-bit signed PCM normalization + channel mixdown) — the shared
    * front end of [[extractAudioFeatures]] and [[audioFingerprint64]].
    * None when no parser accepts the bytes or the stream is empty. */
  private def decodeMono(b: Array[Byte]): Option[Array[Double]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      val fmt = ais.getFormat
      // normalize to 16-bit signed PCM (the JDK converts PCM widths/
      // encodings; compressed input would convert here too)
      val target = new javax.sound.sampled.AudioFormat(
        fmt.getSampleRate, 16, fmt.getChannels, true, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
      val bytes = pcm.readAllBytes()
      pcm.close()
      val ch = target.getChannels
      val n = bytes.length / (2 * ch)
      if (n == 0) None
      else {
        val mono = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            acc += s / 32768.0
            c += 1
          }
          mono(i) = acc / ch
          i += 1
        }
        Some(mono)
      }
    } catch { case _: Exception => None }

  /** 64-bit audio fingerprint: per-window RMS energy over 65 equal windows,
    * bit i = energy(i) > energy(i+1) — the energy-delta construction the
    * public audio-fingerprint family (Haitsma–Kalker 2002) builds on,
    * reduced to one 64-bit word so [[Dedup.hammingPairs]] bands it like
    * SimHash/pHash. Robust to gain-independent edits of the ENVELOPE shape
    * (the comparison is ordinal, so uniform volume scaling preserves every
    * bit); NULL for undecodable bytes. */
  def audioFingerprint64(df: DataFrame, binCol: String,
                         outCol: String = "audio_fp"): DataFrame = {
    val u = udf((b: Array[Byte]) =>
      if (b == null) null
      else decodeMono(b).map { mono =>
        val nw = 65
        val n = mono.length
        val energy = new Array[Double](nw)
        val counts = new Array[Int](nw)
        var i = 0
        while (i < n) {
          val w = math.min(nw - 1, i * nw / n)
          energy(w) += mono(i) * mono(i)
          counts(w) += 1
          i += 1
        }
        var w = 0
        while (w < nw) { if (counts(w) > 0) energy(w) /= counts(w); w += 1 }
        var bits = 0L
        var k = 0
        while (k < 64) {
          if (energy(k) > energy(k + 1)) bits |= (1L << (63 - k))
          k += 1
        }
        f"$bits%016x"
      }.orNull)
    df.withColumn(outCol, u(col(binCol)))
  }

  /** STUB feature extraction: fixed-size float vector per media item
    * (here: deterministic bytes-derived projection; real impl: a vision
    * encoder over `mapPartitions` batches). Batch shape (partition-wise
    * iteration, arrow-friendly row layout) is the real contract. */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16,
                      outCol: String = "features"): DataFrame = {
    val featU = udf((b: Array[Byte]) =>
      if (b == null) null
      else {
        val out = new Array[Float](dim)
        var i = 0
        while (i < b.length) { out(i % dim) += (b(i) & 0xff) / 255.0f; i += 1 }
        val norm = math.sqrt(out.map(x => x * x).sum).toFloat
        if (norm > 0) out.map(_ / norm) else out
      })
    df.withColumn(outCol, featU(col(binCol)))
  }

  /** Frame sampling plumbing for video-like binary columns: emit one row per
    * sampled frame index (the decode that would slice real frames is the
    * stub; the explode + row multiplication is the real plan shape). */
  def sampleFrames(df: DataFrame, binCol: String, everyN: Int, totalFrames: Int = 32): DataFrame =
    df.withColumn("frame_index", explode(sequence(lit(0), lit(totalFrames - 1), lit(everyN))))
      .withColumn("frame_bytes", sha2(concat(col(binCol).cast("string"), col("frame_index").cast("string")), 256))
}
