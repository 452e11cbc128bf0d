package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) reader and
  * writer, from the public spec: records are `WARC/1.x` header blocks
  * (named fields, CRLF lines, blank-line terminator) followed by exactly
  * `Content-Length` payload bytes and a CRLF CRLF record separator.
  *
  * Scale posture: the same interchange-format model as the KML/GPX family —
  * parallelism is per FILE (`binaryFiles`; crawl archives arrive as many
  * ~1 GB segment files, so file-level parallelism is the natural unit), one
  * streaming parser per task, nothing driver-side but the path listing. A
  * `.gz` file is decompressed with the JDK's multi-member-aware
  * GZIPInputStream (Common Crawl gzips per record and concatenates —
  * multi-member streams decode as one continuous stream). The usual
  * pipeline then extracts text ([[graft.functions.TextFunctions.htmlToText]])
  * and writes parquet — WARC is an ingest format, not a query substrate. */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("warc_date", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType),
    // for application/http payloads: the entity body past the first blank
    // line, decoded as UTF-8 (null for non-http records)
    StructField("http_body", StringType)))

  /** Parse every record of one WARC file's bytes. */
  private[graft] def parseRecords(bytes: Array[Byte]): Iterator[Row] = new Iterator[Row] {
    private var pos = 0
    private var nextRow: Row = null
    private def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      val end = if (pos > start && bytes(pos - 1) == '\r') pos - 1 else pos
      if (pos < bytes.length) pos += 1 // consume \n
      new String(bytes, start, end - start, "UTF-8")
    }
    private def advance(): Unit = {
      nextRow = null
      // seek the version line (tolerates leading separators / garbage)
      while (pos < bytes.length && nextRow == null) {
        val mark = pos
        val line = readLine()
        if (line.startsWith("WARC/")) {
          val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
          var h = readLine()
          while (h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0) headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
            h = readLine()
          }
          val len = headers.get("content-length").flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
          val n = math.min(len, (bytes.length - pos).toLong).toInt
          val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
          pos += n
          val ctype = headers.getOrElse("content-type", null)
          val body =
            if (ctype != null && ctype.startsWith("application/http")) {
              val sep = indexOfBlankLine(payload)
              if (sep < 0) null
              else new String(payload, sep, payload.length - sep, "UTF-8")
            } else null
          nextRow = Row(headers.getOrElse("warc-type", null),
            headers.getOrElse("warc-record-id", null),
            headers.getOrElse("warc-date", null),
            headers.getOrElse("warc-target-uri", null),
            ctype, len, payload, body)
        } else if (pos == mark) pos += 1 // safety: never stall
      }
    }
    private def indexOfBlankLine(b: Array[Byte]): Int = {
      var i = 0
      while (i + 3 < b.length) {
        if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i + 4
        i += 1
      }
      -1
    }
    def hasNext: Boolean = { if (nextRow == null) advance(); nextRow != null }
    def next(): Row = { if (nextRow == null) advance(); val r = nextRow; nextRow = null; r }
  }

  private def maybeGunzip(path: String, bytes: Array[Byte]): Array[Byte] =
    if (path.endsWith(".gz") ||
        (bytes.length > 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)) {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  /** Read a WARC file / directory / glob into a DataFrame of records. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (p, pds) =>
      parseRecords(maybeGunzip(p, pds.toArray()))
    }
    spark.createDataFrame(rows, schema)
  }

  private def crlf(s: String): Array[Byte] = (s + "\r\n").getBytes("UTF-8")

  /** One serialized record. Deterministic: the record id derives from the
    * URI (urn:graft:md5(uri)) and `date` is caller-supplied — nothing
    * wall-clock, so a rewrite is byte-identical (retry/restart-stable like
    * every other writer here). */
  private[graft] def record(warcType: String, uri: String, date: String,
                         contentType: String, payload: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val id = "urn:graft:" + md.digest(uri.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(crlf("WARC/1.0"))
    bos.write(crlf(s"WARC-Type: $warcType"))
    bos.write(crlf(s"WARC-Record-ID: <$id>"))
    bos.write(crlf(s"WARC-Date: $date"))
    bos.write(crlf(s"WARC-Target-URI: $uri"))
    bos.write(crlf(s"Content-Type: $contentType"))
    bos.write(crlf(s"Content-Length: ${payload.length}"))
    bos.write(crlf(""))
    bos.write(payload)
    bos.write(crlf(""))
    bos.write(crlf(""))
    bos.toByteArray
  }

  /** Write (uri, body-text) rows as WARC response records wrapping a
    * minimal HTTP/1.1 200 response — the Common Crawl record shape. Single
    * file; use [[writePartitioned]] for a distributed corpus export. */
  def write(df: DataFrame, path: String, uriCol: String, textCol: String,
            date: String = "2026-01-01T00:00:00Z", gzip: Boolean = false,
            maxRows: Long = 1000000L): Unit = {
    // single-file export = driver collect by nature; short-circuiting
    // limit guard BEFORE the collect (same pattern as Gpkg/Feather/
    // FlatGeobuf/Shapefile) so an over-cap corpus errors instead of
    // OOMing the driver
    if (maxRows >= 0) {
      val upTo = df.limit((maxRows + 1).min(Int.MaxValue - 1L).toInt).count()
      require(upTo <= maxRows,
        s"Warc.write is a driver-side single-file export and the frame " +
        s"exceeds $maxRows rows; use writePartitioned for a distributed " +
        s"corpus export, or raise maxRows if the driver can hold the data")
    }
    val rows = df.select(uriCol, textCol).collect()
    val out: java.io.OutputStream = {
      val f = new java.io.FileOutputStream(path)
      if (gzip) new java.util.zip.GZIPOutputStream(f) else f
    }
    try rows.foreach { r =>
      out.write(record("response", r.getString(0), date, "application/http; msgtype=response",
        httpPayload(r.getString(1))))
    } finally out.close()
  }

  /** Distributed export: one `part-<n>.warc` per partition, written on the
    * executors (no driver collect); reads back as one corpus via a glob. */
  def writePartitioned(df: DataFrame, dir: String, uriCol: String, textCol: String,
                       date: String = "2026-01-01T00:00:00Z"): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.select(uriCol, textCol).rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = new java.io.FileOutputStream(s"$dir/part-$pid.warc")
      try it.foreach { r =>
        out.write(record("response", r.getString(0), date,
          "application/http; msgtype=response", httpPayload(r.getString(1))))
      } finally out.close()
    }
  }

  private def httpPayload(text: String): Array[Byte] = {
    val body = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(crlf("HTTP/1.1 200 OK"))
    bos.write(crlf("Content-Type: text/plain; charset=utf-8"))
    bos.write(crlf(s"Content-Length: ${body.length}"))
    bos.write(crlf(""))
    bos.write(body)
    bos.toByteArray
  }
}
