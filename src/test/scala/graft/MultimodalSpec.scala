package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real (JDK ImageIO) decode/resize/feature paths over binary media
  * columns, plus the plumbing-only frame sampler. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("real decode: true dimensions, format, channels from actual bytes") {
    val df = Seq(
      (1L, png(10, 20, 0xff0000)),
      (2L, jpeg(32, 8, 0x0000ff)),
      (3L, "not an image".getBytes("UTF-8"))).toDF("id", "media")
    val meta = Multimodal.withImageMeta(df, "media", real = true)
      .select(col("id"), col("image_meta.format"), col("image_meta.width"),
        col("image_meta.height"), col("image_meta.channels"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).sortBy(_._1).toSeq
    assert(meta(0) == ((1L, "png", 10, 20)))
    assert(meta(1)._2 == "jpeg" && meta(1)._3 == 32 && meta(1)._4 == 8)
    assert(meta(2)._2 == null) // undecodable -> null struct
  }

  test("real resize re-encodes to the target dimensions") {
    val df = Seq((1L, png(16, 16, 0x00ff00))).toDF("id", "media")
    val resized = Multimodal.resize(df, "media", 4, 8)
    val bytes = resized.select("resized").head().getAs[Array[Byte]](0)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(back.getWidth == 4 && back.getHeight == 8)
    assert((back.getRGB(2, 4) & 0xffffff) == 0x00ff00) // color preserved
  }

  test("pixel features: normalized, discriminate colors, stable dim") {
    val df = Seq((1L, png(8, 8, 0xff0000)), (2L, png(8, 8, 0x0000ff))).toDF("id", "media")
    val feats = Multimodal.extractPixelFeatures(df, "media", grid = 4)
      .select(col("id"), col("pixel_features")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length == 48 && feats(2L).length == 48)
    def norm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(feats(1L)) - 1.0) < 1e-5)
    // red image has energy in R components (index % 3 == 0), blue in B
    assert(feats(1L).zipWithIndex.filter(_._2 % 3 == 0).map(_._1).sum > 0.9)
    assert(feats(2L).zipWithIndex.filter(_._2 % 3 == 2).map(_._1).sum > 0.9)
    assert(feats(1L) != feats(2L))
  }

  test("frame sampling multiplies rows by the sampled indices") {
    val df = Seq((1L, "videobytes".getBytes("UTF-8"))).toDF("id", "media")
    val frames = Multimodal.sampleFrames(df, "media", everyN = 8, totalFrames = 32)
    assert(frames.count() == 4)
    assert(frames.select("frame_index").as[Int].collect().sorted.toSeq == Seq(0, 8, 16, 24))
  }
}
