package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal SQLite 3 file WRITER — the inverse of [[Sqlite]]: enough of the
  * published file format to serialize rowid tables (leaf/interior b-trees,
  * overflow chains, record serial types) into a database any SQLite build
  * opens. Single-pass, in-memory page builder for export-sized outputs.
  *
  * Conventions kept simple and spec-legal: 4096-byte pages, no freelist,
  * no indexes, no WITHOUT ROWID, schema format 4, UTF-8.
  */
private[io] final class SqliteWriter(pageSize: Int = 4096) {
  private val usable = pageSize
  private val maxLeafLocal = usable - 35
  private val minLocal = (usable - 12) * 32 / 255 - 23

  /** pages(i) = page number i+1; page 1 reserved for sqlite_master. */
  private val pages = ArrayBuffer[Array[Byte]](new Array[Byte](pageSize))

  private def allocPage(): Int = { pages += new Array[Byte](pageSize); pages.length }

  // ------------------------------------------------------------ encoding

  private def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 0x7f) return Array(v.toByte)
    if (v < 0 || v > ((1L << 56) - 1)) {
      // 9-byte form: 8 continuation bytes carry bits 63..8, last byte all 8 low bits
      val out = new Array[Byte](9)
      out(8) = (v & 0xff).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      return out
    }
    val groups = ArrayBuffer[Byte]()
    var x = v
    while (x != 0) { groups += (x & 0x7f).toByte; x >>>= 7 }
    val g = groups.reverse
    g.zipWithIndex.map { case (b, i) =>
      if (i < g.length - 1) (b | 0x80).toByte else b
    }.toArray
  }

  /** Record payload from typed values; a None value means "NULL stored,
    * real value is the rowid" (INTEGER PRIMARY KEY alias column). */
  def record(values: Seq[Any]): Array[Byte] = {
    val types = ArrayBuffer[Long]()
    val bodies = ArrayBuffer[Array[Byte]]()
    values.foreach {
      case null =>
        types += 0; bodies += Array.empty
      case l: Long =>
        types += 6
        bodies += ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(l).array()
      case i: Int =>
        types += 6
        bodies += ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(i.toLong).array()
      case b: Boolean =>
        types += 6
        bodies += ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(if (b) 1L else 0L).array()
      case d: Double =>
        types += 7
        bodies += ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(d).array()
      case f: Float =>
        types += 7
        bodies += ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(f.toDouble).array()
      case s: String =>
        val b = s.getBytes("UTF-8"); types += 13L + 2L * b.length; bodies += b
      case b: Array[Byte] =>
        types += 12L + 2L * b.length; bodies += b
      // GPKG stores DATE/DATETIME as ISO-8601 TEXT (matching the declared
      // TEXT affinity Gpkg.write emits for these Spark types).
      case d: java.sql.Date =>
        val b = d.toLocalDate.toString.getBytes("UTF-8")
        types += 13L + 2L * b.length; bodies += b
      case t: java.sql.Timestamp =>
        val b = t.toInstant.toString.getBytes("UTF-8")
        types += 13L + 2L * b.length; bodies += b
      case i: java.time.Instant =>
        val b = i.toString.getBytes("UTF-8")
        types += 13L + 2L * b.length; bodies += b
      case d: java.time.LocalDate =>
        val b = d.toString.getBytes("UTF-8")
        types += 13L + 2L * b.length; bodies += b
      case other => throw new UnsupportedOperationException(
        s"sqlite record value of type ${other.getClass.getName}")
    }
    val typeBytes = types.map(varint).toArray
    // header length includes its own varint — iterate to fixpoint
    val typesLen = typeBytes.map(_.length).sum
    var hdrLen = typesLen + 1
    var stable = false
    while (!stable) {
      val next = typesLen + varint(hdrLen.toLong).length
      if (next == hdrLen) stable = true else hdrLen = next
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hdrLen))
    typeBytes.foreach(out.write)
    bodies.foreach(out.write)
    out.toByteArray
  }

  // ------------------------------------------------------------- b-trees

  /** Leaf cell bytes (with overflow chain pages allocated as needed). */
  private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(payload.length.toLong))
    out.write(varint(rowid))
    if (payload.length <= maxLeafLocal) { out.write(payload); return out.toByteArray }
    val k = minLocal + ((payload.length - minLocal) % (usable - 4))
    val local = if (k <= maxLeafLocal) k else minLocal
    out.write(payload, 0, local)
    // overflow chain
    var off = local
    val chain = ArrayBuffer[Int]()
    while (off < payload.length) {
      chain += allocPage()
      off += usable - 4
    }
    out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(chain.head).array())
    off = local
    chain.zipWithIndex.foreach { case (pg, i) =>
      val buf = pages(pg - 1)
      val next = if (i + 1 < chain.length) chain(i + 1) else 0
      ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN).putInt(next)
      val n = math.min(usable - 4, payload.length - off)
      System.arraycopy(payload, off, buf, 4, n)
      off += n
    }
    out.toByteArray
  }

  /** Serialize one b-tree page at `base` offset within `buf`. For interior
    * pages, `cells` are (childMaxKey, cellBytesWithoutKeyOrChild) pre-built
    * by the caller via interiorCell. */
  private def writeBtreePage(buf: Array[Byte], base: Int, pageType: Int,
                             cells: Seq[(Long, Array[Byte])], rightMost: Option[Int]): Unit = {
    val headerSize = if (pageType == 5) 12 else 8
    buf(base) = pageType.toByte
    val n = cells.length
    buf(base + 3) = ((n >> 8) & 0xff).toByte
    buf(base + 4) = (n & 0xff).toByte
    rightMost.foreach { rm =>
      ByteBuffer.wrap(buf, base + 8, 4).order(ByteOrder.BIG_ENDIAN).putInt(rm)
    }
    var contentTop = pageSize
    val ptrBase = base + headerSize
    cells.zipWithIndex.foreach { case ((_, c), i) =>
      contentTop -= c.length
      System.arraycopy(c, 0, buf, contentTop, c.length)
      buf(ptrBase + 2 * i) = ((contentTop >> 8) & 0xff).toByte
      buf(ptrBase + 2 * i + 1) = (contentTop & 0xff).toByte
    }
    buf(base + 5) = ((contentTop >> 8) & 0xff).toByte
    buf(base + 6) = (contentTop & 0xff).toByte
    require(ptrBase + 2 * n <= contentTop, s"b-tree page overflow: $n cells")
  }

  /** Build a table b-tree from (rowid, recordPayload) pairs; returns the
    * root page number. `rootAtPage1` routes the final root into page 1
    * (sqlite_master). */
  def buildTable(records: Seq[(Long, Array[Byte])], rootAtPage1: Boolean = false): Int = {
    val leafCells = records.map { case (rid, payload) => (rid, leafCell(rid, payload)) }
    if (rootAtPage1 && fitsOnOnePage(leafCells, headerSize = 8, base = 100)) {
      writeBtreePage(pages(0), 100, 13, leafCells, None)
      return 1
    }
    if (leafCells.isEmpty) {
      // empty table: a single empty leaf
      if (rootAtPage1) { writeBtreePage(pages(0), 100, 13, Nil, None); return 1 }
      val pg = allocPage()
      writeBtreePage(pages(pg - 1), 0, 13, Nil, None)
      return pg
    }
    var level: Seq[(Int, Long)] = packLevel(leafCells, 13)
    while (level.length > 1) {
      val interiorCells = level.init.map { case (pg, maxKey) =>
        val cell = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(pg).array() ++ varint(maxKey)
        (maxKey, cell)
      }
      val rightMost = level.last._1
      if (rootAtPage1 && fitsOnOnePage(interiorCells, headerSize = 12, base = 100)) {
        writeBtreePage(pages(0), 100, 5, interiorCells, Some(rightMost))
        return 1
      }
      if (fitsOnOnePage(interiorCells, headerSize = 12, base = 0)) {
        val pg = allocPage()
        writeBtreePage(pages(pg - 1), 0, 5, interiorCells, Some(rightMost))
        level = Seq((pg, level.last._2))
      } else {
        // split interior level and recurse upward
        val split = packInterior(interiorCells, rightMost, level.last._2)
        level = split
      }
    }
    if (rootAtPage1) {
      // single leaf/interior but too big for page 1's 100-byte-offset area:
      // add one interior root at page 1 pointing at it
      writeBtreePage(pages(0), 100, 5, Nil, Some(level.head._1))
      1
    } else level.head._1
  }

  private def fitsOnOnePage(cells: Seq[(Long, Array[Byte])], headerSize: Int, base: Int): Boolean =
    base + headerSize + cells.map(c => 2 + c._2.length).sum <= pageSize

  /** Greedy leaf/interior packing at base 0; returns (page, maxKey) list. */
  private def packLevel(cells: Seq[(Long, Array[Byte])], pageType: Int): Seq[(Int, Long)] = {
    val headerSize = if (pageType == 5) 12 else 8
    val groups = ArrayBuffer[ArrayBuffer[(Long, Array[Byte])]](ArrayBuffer())
    var used = 0
    cells.foreach { case (k, c) =>
      val need = 2 + c.length
      if (groups.last.nonEmpty && headerSize + used + need > pageSize) {
        groups += ArrayBuffer(); used = 0
      }
      groups.last += ((k, c)); used += need
    }
    groups.map { g =>
      val pg = allocPage()
      writeBtreePage(pages(pg - 1), 0, pageType, g.toSeq, None)
      (pg, g.last._1)
    }.toSeq
  }

  private def packInterior(cells: Seq[(Long, Array[Byte])], rightMost: Int,
                           maxKey: Long): Seq[(Int, Long)] = {
    // pack interior cells into multiple pages; each page's right-most child
    // is the child of its LAST cell (which then drops out of the cell list)
    val headerSize = 12
    val groups = ArrayBuffer[ArrayBuffer[(Long, Array[Byte])]](ArrayBuffer())
    var used = 0
    cells.foreach { case (k, c) =>
      val need = 2 + c.length
      if (groups.last.nonEmpty && headerSize + used + need > pageSize - 64) {
        groups += ArrayBuffer(); used = 0
      }
      groups.last += ((k, c)); used += need
    }
    groups.zipWithIndex.map { case (g, gi) =>
      val isLast = gi == groups.length - 1
      val pg = allocPage()
      if (isLast) {
        writeBtreePage(pages(pg - 1), 0, 5, g.toSeq, Some(rightMost))
        (pg, maxKey)
      } else {
        // last cell's child becomes this page's right-most pointer
        val child = ByteBuffer.wrap(g.last._2, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt
        writeBtreePage(pages(pg - 1), 0, 5, g.init.toSeq, Some(child))
        (pg, g.last._1)
      }
    }.toSeq
  }

  // -------------------------------------------------------------- finish

  /** Write the 100-byte header into page 1 and emit the file bytes.
    * `applicationId` 0x47504B47 = "GPKG". */
  def finish(applicationId: Int = 0, userVersion: Int = 0): Array[Byte] = {
    val h = ByteBuffer.wrap(pages(0)).order(ByteOrder.BIG_ENDIAN)
    h.put("SQLite format 3".getBytes("ISO-8859-1")); h.put(0.toByte)
    h.putShort(if (pageSize == 65536) 1 else pageSize.toShort) // 16
    h.put(1.toByte).put(1.toByte)                              // 18 write/read version
    h.put(0.toByte)                                            // 20 reserved
    h.put(64.toByte).put(32.toByte).put(32.toByte)             // 21-23 payload fractions
    h.putInt(1)                                                // 24 change counter
    h.putInt(pages.length)                                     // 28 db size in pages
    h.putInt(0).putInt(0)                                      // 32 freelist trunk, count
    h.putInt(1)                                                // 40 schema cookie
    h.putInt(4)                                                // 44 schema format
    h.putInt(0)                                                // 48 page cache size
    h.putInt(0)                                                // 52 largest root (vacuum off)
    h.putInt(1)                                                // 56 text encoding utf-8
    h.putInt(userVersion)                                      // 60 user version
    h.putInt(0)                                                // 64 incremental vacuum
    h.putInt(applicationId)                                    // 68 application id
    h.position(92)
    h.putInt(1)                                                // 92 version-valid-for
    h.putInt(3045000)                                          // 96 sqlite version number
    val out = new java.io.ByteArrayOutputStream(pages.length * pageSize)
    pages.foreach(out.write)
    out.toByteArray
  }
}
