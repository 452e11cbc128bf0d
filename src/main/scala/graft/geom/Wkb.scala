package graft.geom

import org.locationtech.jts.geom.{Geometry, GeometryFactory, PrecisionModel}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** WKB is the canonical on-wire/in-column geometry encoding for the whole
  * engine (cf. reference `geopandas/array.py:217-291` which round-trips WKB
  * via shapely). Geometry columns are Spark `BinaryType` holding these bytes;
  * NULL bytes = missing geometry (reference `array.py:72-75`).
  *
  * All readers/writers are thread-local: Spark executes many tasks per JVM.
  */
object Wkb {
  val factory = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 0)

  private val reader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val writer2 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  private val writer3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3))
  // XYZM writer — for sequences that actually carry Z (dimension 4).
  private val writer4 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(4))
  // XYM-only writer: WKBWriter hardcodes M at ordinate index 3, but an XYM
  // CoordinateArraySequence is dimension 3 with M at index 2 — asking a
  // dimension-4 writer for it throws "Invalid ordinate index: 3". Restricting
  // a dimension-3 writer to {X,Y,M} makes it read index 2 and set the EWKB
  // M flag, which WKBReader round-trips back to CoordinateXYM.
  private val writerM = ThreadLocal.withInitial[WKBWriter](() => {
    val w = new WKBWriter(3)
    w.setOutputOrdinates(java.util.EnumSet.of(
      org.locationtech.jts.io.Ordinate.X,
      org.locationtech.jts.io.Ordinate.Y,
      org.locationtech.jts.io.Ordinate.M))
    w
  })
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => {
    val w = new WKTWriter(4)
    w
  })

  def read(b: Array[Byte]): Geometry =
    if (b == null) null else reader.get.read(b)

  def write(g: Geometry): Array[Byte] =
    if (g == null) null
    else if (hasM(g) && !hasZ(g)) writerM.get.write(g)
    else if (hasM(g)) writer4.get.write(g)
    else if (hasZ(g)) writer3.get.write(g)
    else writer2.get.write(g)

  def readWkt(s: String): Geometry =
    if (s == null) null else wktReader.get.read(s)

  def writeWkt(g: Geometry): String =
    if (g == null) null else wktWriter.get.write(g)

  /** True if any coordinate carries a Z (reference `base.py:812 has_z`). */
  def hasZ(g: Geometry): Boolean = {
    if (g.isEmpty) return false
    val c = g.getCoordinate
    c != null && !java.lang.Double.isNaN(c.getZ)
  }

  /** True if the first coordinate carries an M (reference `base.py:843
    * has_m`) — same first-coordinate convention as [[hasZ]]. Without this
    * probe the codec silently dropped M: measured geometries parsed fine
    * but lost M on the very first column write (caught by the q109 gate). */
  def hasM(g: Geometry): Boolean = {
    if (g.isEmpty) return false
    val c = g.getCoordinate
    c != null && !java.lang.Double.isNaN(c.getM)
  }
}
