package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media travels as opaque `BinaryType` columns next to a typed
  * metadata struct; per-item compute (decode, feature-extract, resize,
  * frame-sample) runs as batch functions over partitions so a real codec
  * drops in without changing the plan shape.
  *
  * NOTE — decode stubs: this container has no image/audio codecs, so the
  * byte-level decode below is a clearly-marked deterministic FAKE (header
  * sniff + hash-derived dimensions). The Spark-side plumbing — schema,
  * batching, partition mapping, UDF signatures — is real and tested; swap
  * `fakeDecode` for a JNI/javacv call in production.
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

  /** Attach an image-metadata struct column. */
  def withImageMeta(df: DataFrame, binCol: String, metaCol: String = "image_meta"): DataFrame =
    df.withColumn(metaCol, decodeImageMetaU(col(binCol)))
      .withColumn(metaCol, struct(
        col(s"$metaCol._1").as("format"), col(s"$metaCol._2").as("width"),
        col(s"$metaCol._3").as("height"), col(s"$metaCol._4").as("channels"),
        col(s"$metaCol._5").as("size_bytes")))

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

  /** STUB resize: passes bytes through while rewriting metadata — the real
    * version re-encodes pixels; plumbing (column in, column out, no
    * shuffle) is what's exercised. */
  def resizeStub(df: DataFrame, binCol: String, metaCol: String,
                 targetW: Int, targetH: Int): DataFrame =
    df.withColumn(metaCol, struct(
      col(s"$metaCol.format"), lit(targetW).as("width"), lit(targetH).as("height"),
      col(s"$metaCol.channels"), col(s"$metaCol.size_bytes")))

  /** Frame sampling plumbing for video-like binary columns: emit one row per
    * sampled frame index (the decode that would slice real frames is the
    * stub; the explode + row multiplication is the real plan shape). */
  def sampleFrames(df: DataFrame, binCol: String, everyN: Int, totalFrames: Int = 32): DataFrame =
    df.withColumn("frame_index", explode(sequence(lit(0), lit(totalFrames - 1), lit(everyN))))
      .withColumn("frame_bytes", sha2(concat(col(binCol).cast("string"), col("frame_index").cast("string")), 256))
}
