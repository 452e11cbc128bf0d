package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal READ-ONLY SQLite 3 file parser — just enough of the published
  * file format (https://www.sqlite.org/fileformat2.html) to walk table
  * B-trees and decode records, which is all a GeoPackage needs. Independent
  * implementation against the format spec; the reference reads GPKG through
  * GDAL's OGR driver (`geopandas/io/file.py:197-339`), which links the real
  * SQLite library — not an option on a JVM with zero extra dependencies.
  *
  * Supported: table b-trees (interior/leaf), overflow page chains, all
  * record serial types, rowid-alias INTEGER PRIMARY KEY columns, UTF-8
  * text. Not supported (not needed read-only): indexes, WAL, freelists,
  * WITHOUT ROWID tables, pointer maps (auto_vacuum files still parse —
  * ptrmap pages are never reachable from a table b-tree root).
  */
private[io] object Sqlite {

  /** Random-access page provider: whole-array for executor-side parses,
    * seek-based for cheap driver-side schema reads. Pages are 1-based. */
  trait PageSource {
    def pageSize: Int
    def reservedBytes: Int
    def page(n: Int): Array[Byte]
    def usableSize: Int = pageSize - reservedBytes
  }

  final class ArraySource(bytes: Array[Byte]) extends PageSource {
    require(bytes.length >= 100 && bytes(0) == 'S', "not an SQLite file")
    // binaryFiles (and JVM arrays) cap at ~2 GiB; the declared page count is
    // checked so a truncated read of a bigger file fails loudly here rather
    // than as a negative copyOfRange bound deep in the b-tree walk.
    require({
      val declaredPages =
        ((bytes(28) & 0xffL) << 24) | ((bytes(29) & 0xffL) << 16) |
          ((bytes(30) & 0xffL) << 8) | (bytes(31) & 0xffL)
      val ps = { val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff); if (raw == 1) 65536 else raw }
      declaredPages == 0 || declaredPages * ps.toLong <= bytes.length.toLong
    }, "GeoPackage larger than the loaded bytes (files over 2 GB are not " +
       "supported by the whole-file reader — convert to GeoParquet)")
    val pageSize: Int = {
      val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    val reservedBytes: Int = bytes(20) & 0xff
    def page(n: Int): Array[Byte] = {
      val off = (n - 1).toLong * pageSize
      java.util.Arrays.copyOfRange(bytes, off.toInt, math.min(bytes.length.toLong, off + pageSize).toInt)
    }
  }

  /** Hadoop-FS-backed source reading only the pages it is asked for. */
  final class StreamSource(in: org.apache.hadoop.fs.FSDataInputStream, fileLen: Long) extends PageSource {
    private val header = new Array[Byte](100)
    in.readFully(0, header)
    require(header(0) == 'S', "not an SQLite file")
    val pageSize: Int = {
      val raw = ((header(16) & 0xff) << 8) | (header(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    val reservedBytes: Int = header(20) & 0xff
    def page(n: Int): Array[Byte] = {
      val off = (n - 1).toLong * pageSize
      val len = math.min(pageSize.toLong, fileLen - off).toInt
      val buf = new Array[Byte](len)
      in.readFully(off, buf)
      buf
    }
  }

  /** (value, bytesConsumed) of a big-endian 7-bit varint (9th byte = 8 bits). */
  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      if ((x & 0x80) == 0) return ((v << 7) | x, i + 1)
      v = (v << 7) | (x & 0x7f)
      i += 1
    }
    (((v << 8) | (b(off + 8) & 0xff)), 9)
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u32(b: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.BIG_ENDIAN).getInt.toLong & 0xffffffffL

  /** Assemble a cell payload, following the overflow chain when the local
    * part is truncated (spec §1.6: thresholds below). */
  private def payload(src: PageSource, pg: Array[Byte], off: Int, payloadLen: Long): Array[Byte] = {
    val usable = src.usableSize
    val maxLocal = usable - 35
    if (payloadLen <= maxLocal)
      return java.util.Arrays.copyOfRange(pg, off, off + payloadLen.toInt)
    val minLocal = (usable - 12) * 32 / 255 - 23
    val k = minLocal + ((payloadLen - minLocal) % (usable - 4)).toInt
    val local = if (k <= maxLocal) k else minLocal
    val out = new Array[Byte](payloadLen.toInt)
    System.arraycopy(pg, off, out, 0, local)
    var written = local
    var next = u32(pg, off + local)
    while (next != 0 && written < payloadLen) {
      val op = src.page(next.toInt)
      val n = math.min(usable - 4, payloadLen.toInt - written)
      System.arraycopy(op, 4, out, written, n)
      written += n
      next = u32(op, 0)
    }
    out
  }

  /** Decode a record payload into column values: null / java.lang.Long /
    * java.lang.Double / String / Array[Byte]. */
  private[io] def decodeRecord(p: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = varint(p, 0)
    val types = new scala.collection.mutable.ArrayBuffer[Long]()
    var off = n0
    while (off < hdrLen) {
      val (t, n) = varint(p, off)
      types += t
      off += n
    }
    var body = hdrLen.toInt
    val out = new Array[Any](types.length)
    var i = 0
    while (i < types.length) {
      val t = types(i)
      t match {
        case 0 => out(i) = null
        case 1 => out(i) = java.lang.Long.valueOf(p(body).toLong); body += 1
        case 2 | 3 | 4 | 5 | 6 =>
          val len = t match { case 2 => 2; case 3 => 3; case 4 => 4; case 5 => 6; case _ => 8 }
          var v = 0L
          var j = 0
          while (j < len) { v = (v << 8) | (p(body + j) & 0xff); j += 1 }
          // sign-extend from len*8 bits
          val shift = 64 - len * 8
          out(i) = java.lang.Long.valueOf((v << shift) >> shift)
          body += len
        case 7 =>
          out(i) = java.lang.Double.valueOf(
            ByteBuffer.wrap(p, body, 8).order(ByteOrder.BIG_ENDIAN).getDouble)
          body += 8
        case 8 => out(i) = java.lang.Long.valueOf(0L)
        case 9 => out(i) = java.lang.Long.valueOf(1L)
        case t if t >= 12 && t % 2 == 0 =>
          val len = ((t - 12) / 2).toInt
          out(i) = java.util.Arrays.copyOfRange(p, body, body + len); body += len
        case t if t >= 13 =>
          val len = ((t - 13) / 2).toInt
          out(i) = new String(p, body, len, "UTF-8"); body += len
        case other => throw new IllegalStateException(s"reserved serial type $other")
      }
      i += 1
    }
    out
  }

  /** Iterate all (rowid, record) pairs of the table b-tree rooted at
    * `root`, in-order (depth-first through interior pages). */
  def tableRows(src: PageSource, root: Int): Iterator[(Long, Array[Any])] = {
    def walk(pageNo: Int): Iterator[(Long, Array[Any])] = {
      val pg = src.page(pageNo)
      val base = if (pageNo == 1) 100 else 0 // page 1 embeds the 100-byte file header
      val ptype = pg(base) & 0xff
      val nCells = u16(pg, base + 3)
      ptype match {
        case 5 => // interior table: children left of each cell + right-most
          val kids = (0 until nCells).iterator.map { c =>
            u32(pg, u16(pg, base + 12 + 2 * c)).toInt
          } ++ Iterator.single(u32(pg, base + 8).toInt)
          kids.flatMap(walk)
        case 13 => // leaf table
          (0 until nCells).iterator.map { c =>
            var off = u16(pg, base + 8 + 2 * c)
            val (plen, n1) = varint(pg, off); off += n1
            val (rowid, n2) = varint(pg, off); off += n2
            (rowid, decodeRecord(payload(src, pg, off, plen)))
          }
        case other => throw new IllegalStateException(s"unexpected b-tree page type $other")
      }
    }
    walk(root)
  }

  /** sqlite_master: (type, name, tbl_name, rootpage, sql) from page 1. */
  final case class MasterRow(kind: String, name: String, tblName: String, rootPage: Int, sql: String)
  def master(src: PageSource): Seq[MasterRow] =
    tableRows(src, 1).map { case (_, r) =>
      MasterRow(asStr(r(0)), asStr(r(1)), asStr(r(2)),
        r(3) match { case l: java.lang.Long => l.intValue(); case _ => 0 }, asStr(r(4)))
    }.toSeq

  private def asStr(v: Any): String = v match { case s: String => s; case null => null; case o => o.toString }

  /** Column (name, declaredType) pairs out of a CREATE TABLE statement —
    * top-level comma split, quotes stripped, table constraints skipped. */
  private[io] def parseCreateColumns(sql: String): Seq[(String, String)] = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    if (open < 0 || close <= open) return Nil
    val body = sql.substring(open + 1, close)
    val defs = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr: Char = 0
    body.foreach { ch =>
      if (inStr != 0) { cur.append(ch); if (ch == inStr) inStr = 0 }
      else ch match {
        case '(' => depth += 1; cur.append(ch)
        case ')' => depth -= 1; cur.append(ch)
        case '\'' | '"' | '`' => inStr = ch; cur.append(ch)
        case ',' if depth == 0 => defs += cur.toString; cur.clear()
        case _ => cur.append(ch)
      }
    }
    if (cur.nonEmpty) defs += cur.toString
    val constraintKw = Set("CONSTRAINT", "PRIMARY", "UNIQUE", "FOREIGN", "CHECK")
    defs.iterator.map(_.trim).filter(_.nonEmpty)
      .filterNot(d => constraintKw.contains(d.split("\\s+")(0).toUpperCase))
      .map { d =>
        val (name, rest) =
          if (d.startsWith("\"") || d.startsWith("`"))
            (d.substring(1, d.indexOf(d.charAt(0), 1)), d.substring(d.indexOf(d.charAt(0), 1) + 1))
          else if (d.startsWith("["))
            (d.substring(1, d.indexOf(']')), d.substring(d.indexOf(']') + 1))
          else {
            val sp = d.indexOf(' ')
            if (sp < 0) (d, "") else (d.substring(0, sp), d.substring(sp))
          }
        (name, rest.trim)
      }.toSeq
  }
}
