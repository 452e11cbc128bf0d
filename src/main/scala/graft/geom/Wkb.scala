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
  // XYZM writer: JTS intersects the requested ordinates with what the
  // coordinate sequence actually carries, so XYM geometries write M-only
  private val writer4 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(4))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => {
    val w = new WKTWriter(4)
    w
  })

  def read(b: Array[Byte]): Geometry =
    if (b == null) null else reader.get.read(b)

  def write(g: Geometry): Array[Byte] =
    if (g == null) null
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
