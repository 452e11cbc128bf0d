package graft

import graft.ops.Multimodal
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property laws over the pure media-fingerprint kernels (no Spark):
  * the perceptual hash is invariant under lossless re-encode, and the
  * audio fingerprint's ordinal construction is provably gain-invariant. */
object MediaProperties extends Properties("graft.media") {

  private val genImg: Gen[java.awt.image.BufferedImage] = for {
    w <- Gen.chooseNum(8, 48)
    h <- Gen.chooseNum(8, 48)
    seed <- Gen.chooseNum(0, Int.MaxValue)
  } yield {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = (x * 73856093 ^ y * 19349663 ^ seed) * 0x9e3775cd
        img.setRGB(x, y, m & 0xffffff)
        x += 1
      }
      y += 1
    }
    img
  }

  property("pHash is invariant under lossless PNG re-encode") = forAll(genImg) { img =>
    val h0 = Multimodal.phashOf(img)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    Multimodal.phashOf(back) == h0
  }

  property("pHash is a 16-char lowercase hex string, deterministic") = forAll(genImg) { img =>
    val h = Multimodal.phashOf(img)
    h.matches("[0-9a-f]{16}") && Multimodal.phashOf(img) == h
  }

  // random window envelopes with DISTINCT adjacent amplitudes: every
  // ordinal energy comparison is then dominated by the amp² ratio (≥ 4×),
  // so requantization under a gain change can never flip a bit. (Equal
  // adjacent amplitudes are phase-energy near-ties where quantization
  // noise could — the deterministic classToneWav fixture pins that case.)
  private val genEnvelope: Gen[List[Double]] =
    Gen.listOfN(65, Gen.oneOf(0, 1, 2)).map { picks =>
      val amps = Array(0.05, 0.2, 0.6)
      var prev = -1
      picks.map { p =>
        val c = if (p == prev) (p + 1) % 3 else p
        prev = c
        amps(c)
      }
    }

  private def wav(env: List[Double], gain: Double): Array[Byte] = {
    val rate = 8000
    val framesPerWin = 20
    val n = env.length * framesPerWin
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2).put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      val amp = env(i / framesPerWin) * gain
      bb.putShort((math.sin(2 * math.Pi * 440.0 * i / rate) * amp * 32767).toInt.toShort)
      i += 1
    }
    bb.array()
  }

  property("audio fingerprint is gain-invariant on random envelopes") =
    forAll(genEnvelope, Gen.oneOf(0.25, 0.5, 0.75)) { (env, gain) =>
      // computed through the same Spark-free kernel the UDF wraps, via a
      // 1-row local DataFrame-free path: decode + fingerprint by hand is
      // private, so compare the two WAVs through the public UDF-free route
      // of fingerprinting equal-shaped envelopes — full vs scaled
      val spark = SparkTestBase.spark
      import spark.implicits._
      val fps = Multimodal.audioFingerprint64(
          Seq((1L, wav(env, 1.0)), (2L, wav(env, gain))).toDF("id", "wav"), "wav")
        .select("audio_fp").as[String].collect()
      fps(0) == fps(1)
    }
}
