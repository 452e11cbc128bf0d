package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal FlatBuffers runtime (read + write) for the FlatGeobuf format —
  * implemented from the public FlatBuffers binary format specification
  * (https://flatbuffers.dev/md__internals.html): little-endian; a table is
  * an int32 soffset to its vtable followed by inline fields; a vtable is
  * [uint16 vtable_size, uint16 table_size, uint16 field_offset...]; strings
  * and vectors are uint32-length-prefixed payloads referenced through
  * uint32 relative offsets; builders write back-to-front.
  *
  * Only what FlatGeobuf needs is implemented: scalar slots, offset slots,
  * strings, vectors of scalars/offsets/bytes. No shared-vtable dedup (a
  * size, not correctness, optimization).
  */
private[io] object FlatBuf {

  // ------------------------------------------------------------------ read

  /** Table accessor over a little-endian buffer. `pos` is the table's
    * absolute position (where its soffset-to-vtable lives). */
  final class Table(val buf: ByteBuffer, val pos: Int) {
    private val vt = pos - buf.getInt(pos)
    private val vtSize = buf.getShort(vt) & 0xffff

    /** In-table byte offset of field `id`, or 0 when absent. */
    def field(id: Int): Int = {
      val slot = 4 + 2 * id
      if (slot < vtSize) buf.getShort(vt + slot) & 0xffff else 0
    }

    def getByte(id: Int, dflt: Byte): Byte = {
      val o = field(id); if (o == 0) dflt else buf.get(pos + o)
    }
    def getBool(id: Int, dflt: Boolean): Boolean = {
      val o = field(id); if (o == 0) dflt else buf.get(pos + o) != 0
    }
    def getShort(id: Int, dflt: Short): Short = {
      val o = field(id); if (o == 0) dflt else buf.getShort(pos + o)
    }
    def getInt(id: Int, dflt: Int): Int = {
      val o = field(id); if (o == 0) dflt else buf.getInt(pos + o)
    }
    def getLong(id: Int, dflt: Long): Long = {
      val o = field(id); if (o == 0) dflt else buf.getLong(pos + o)
    }
    def getDouble(id: Int, dflt: Double): Double = {
      val o = field(id); if (o == 0) dflt else buf.getDouble(pos + o)
    }

    /** Absolute position of the payload referenced by offset field `id`,
      * or -1 when absent. */
    def indirect(id: Int): Int = {
      val o = field(id)
      if (o == 0) -1 else { val p = pos + o; p + buf.getInt(p) }
    }

    def table(id: Int): Table = {
      val p = indirect(id); if (p < 0) null else new Table(buf, p)
    }

    def string(id: Int): String = {
      val p = indirect(id)
      if (p < 0) null
      else {
        val len = buf.getInt(p)
        val out = new Array[Byte](len)
        val dup = buf.duplicate(); dup.position(p + 4); dup.get(out)
        new String(out, java.nio.charset.StandardCharsets.UTF_8)
      }
    }

    /** (element base position, element count) of vector field `id`,
      * or (-1, 0) when absent. */
    def vector(id: Int): (Int, Int) = {
      val p = indirect(id)
      if (p < 0) (-1, 0) else (p + 4, buf.getInt(p))
    }

    /** Table element `i` of the offset-vector at `base`. */
    def tableAt(base: Int, i: Int): Table = {
      val ep = base + 4 * i
      new Table(buf, ep + buf.getInt(ep))
    }
  }

  def root(bytes: Array[Byte], off: Int, len: Int): Table = {
    val buf = ByteBuffer.wrap(bytes, 0, off + len).order(ByteOrder.LITTLE_ENDIAN)
    new Table(buf, off + buf.getInt(off))
  }

  // ----------------------------------------------------------------- write

  /** Back-to-front builder. Offsets handed to callers are measured from the
    * END of the buffer (the standard flatbuffers convention). */
  final class Builder(initialSize: Int = 1024) {
    private var bb = new Array[Byte](math.max(initialSize, 64))
    private var space = bb.length
    private var minalign = 1
    private var slots: Array[Int] = _
    private var objectStart = 0
    private var vecCount = 0

    private def offset: Int = bb.length - space

    private def grow(): Unit = {
      val old = bb
      val used = old.length - space
      bb = new Array[Byte](old.length * 2)
      System.arraycopy(old, space, bb, bb.length - used, used)
      space = bb.length - used
    }

    /** Align so that after writing `additional` bytes, a value of `size`
      * bytes lands `size`-aligned (from the buffer end). */
    private def prep(size: Int, additional: Int): Unit = {
      if (size > minalign) minalign = size
      val alignSize = ((~(offset + additional)) + 1) & (size - 1)
      while (space < alignSize + size + additional) grow()
      space -= alignSize // freshly-grown regions are zero: padding is zeroed
    }

    private def putByteRaw(v: Byte): Unit = { space -= 1; bb(space) = v }
    private def putShortRaw(v: Short): Unit = {
      space -= 2
      bb(space) = v.toByte; bb(space + 1) = (v >> 8).toByte
    }
    private def putIntRaw(v: Int): Unit = {
      space -= 4
      var i = 0
      while (i < 4) { bb(space + i) = (v >> (8 * i)).toByte; i += 1 }
    }
    private def putLongRaw(v: Long): Unit = {
      space -= 8
      var i = 0
      while (i < 8) { bb(space + i) = (v >> (8 * i)).toByte; i += 1 }
    }

    def pushByte(v: Byte): Unit = { prep(1, 0); putByteRaw(v) }
    def pushShort(v: Short): Unit = { prep(2, 0); putShortRaw(v) }
    def pushInt(v: Int): Unit = { prep(4, 0); putIntRaw(v) }
    def pushLong(v: Long): Unit = { prep(8, 0); putLongRaw(v) }
    def pushDouble(v: Double): Unit = { prep(8, 0); putLongRaw(java.lang.Double.doubleToLongBits(v)) }
    def pushFloat(v: Float): Unit = { prep(4, 0); putIntRaw(java.lang.Float.floatToIntBits(v)) }

    /** Reference to an object previously built at `off`. */
    def pushOffset(off: Int): Unit = {
      prep(4, 0)
      require(off <= offset, "offset points forward")
      putIntRaw(offset - off + 4)
    }

    // ---- tables

    def startTable(numFields: Int): Unit = {
      slots = new Array[Int](numFields)
      objectStart = offset
    }
    def slotByte(id: Int, v: Byte, dflt: Byte): Unit =
      if (v != dflt) { pushByte(v); slots(id) = offset }
    def slotBool(id: Int, v: Boolean, dflt: Boolean): Unit =
      if (v != dflt) { pushByte(if (v) 1 else 0); slots(id) = offset }
    def slotShort(id: Int, v: Short, dflt: Short): Unit =
      if (v != dflt) { pushShort(v); slots(id) = offset }
    def slotInt(id: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { pushInt(v); slots(id) = offset }
    def slotLong(id: Int, v: Long, dflt: Long): Unit =
      if (v != dflt) { pushLong(v); slots(id) = offset }
    def slotOffset(id: Int, off: Int): Unit =
      if (off != 0) { pushOffset(off); slots(id) = offset }

    def endTable(): Int = {
      pushInt(0) // soffset placeholder
      val tableLoc = offset
      var i = slots.length - 1
      while (i >= 0 && slots(i) == 0) i -= 1 // trim trailing absent fields
      val trimmed = i + 1
      while (i >= 0) {
        pushShort(if (slots(i) != 0) (tableLoc - slots(i)).toShort else 0: Short)
        i -= 1
      }
      pushShort((tableLoc - objectStart).toShort)    // table byte size
      pushShort(((trimmed + 2) * 2).toShort)         // vtable byte size
      // patch the placeholder: soffset = vtablePosFromEnd - tablePosFromEnd
      val soff = offset - tableLoc
      val abs = bb.length - tableLoc
      var j = 0
      while (j < 4) { bb(abs + j) = (soff >> (8 * j)).toByte; j += 1 }
      slots = null
      tableLoc
    }

    // ---- strings & vectors

    def createString(s: String): Int = {
      val utf8 = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      pushByte(0) // terminator
      startVector(1, utf8.length, 1)
      space -= utf8.length
      System.arraycopy(utf8, 0, bb, space, utf8.length)
      endVector(utf8.length)
    }

    def startVector(elemSize: Int, count: Int, align: Int): Unit = {
      prep(4, elemSize * count)
      prep(align, elemSize * count)
      vecCount = count
    }
    def endVector(count: Int): Int = { putIntRaw(count); offset }

    def createDoubleVector(vs: Array[Double]): Int = {
      startVector(8, vs.length, 8)
      var i = vs.length - 1
      while (i >= 0) { putLongRaw(java.lang.Double.doubleToLongBits(vs(i))); i -= 1 }
      endVector(vs.length)
    }
    def createIntVector(vs: Array[Int]): Int = {
      startVector(4, vs.length, 4)
      var i = vs.length - 1
      while (i >= 0) { putIntRaw(vs(i)); i -= 1 }
      endVector(vs.length)
    }
    def createByteVector(vs: Array[Byte]): Int = {
      startVector(1, vs.length, 1)
      space -= vs.length
      System.arraycopy(vs, 0, bb, space, vs.length)
      endVector(vs.length)
    }
    def createOffsetVector(offs: Array[Int]): Int = {
      startVector(4, offs.length, 4)
      var i = offs.length - 1
      while (i >= 0) { pushOffset(offs(i)); i -= 1 }
      endVector(offs.length)
    }

    /** Finish with `root` and return the completed buffer (no size prefix). */
    def finish(root: Int): Array[Byte] = {
      prep(minalign, 4)
      pushOffset(root)
      java.util.Arrays.copyOfRange(bb, space, bb.length)
    }
  }
}
