package graft

import graft.geom.{GeomOps, Hilbert, Wkb}
import org.locationtech.jts.geom.Geometry
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level tests (no Spark session) mirroring the reference's
  * per-operator unit tests (`geopandas/tests/test_geom_methods.py`). */
class GeomOpsSpec extends AnyFunSuite {

  private def wkt(s: String): Geometry = Wkb.readWkt(s)

  test("wkb roundtrip identity") {
    val geoms = Seq(
      "POINT (1 2)", "POINT (1.5 -2.25)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((0 0), (1 1))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))")
    geoms.foreach { s =>
      val g = wkt(s)
      val rt = Wkb.read(Wkb.write(g))
      assert(rt.equalsExact(g), s"roundtrip failed for $s")
    }
  }

  test("wkb roundtrip preserves Z") {
    val g = GeomOps.pointZ(1, 2, 3)
    val rt = Wkb.read(Wkb.write(g))
    assert(rt.getCoordinate.getZ == 3.0)
  }

  test("null and empty are distinct") {
    assert(Wkb.read(null) == null)
    assert(Wkb.write(null) == null)
    val empty = wkt("POLYGON EMPTY")
    assert(GeomOps.isEmpty(empty))
    assert(Wkb.read(Wkb.write(empty)).isEmpty)
  }

  test("area and length") {
    assert(GeomOps.area(wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")) == 4.0)
    assert(GeomOps.length(wkt("LINESTRING (0 0, 3 4)")) == 5.0)
  }

  test("binary predicates on unit squares") {
    val a = GeomOps.makeBox(0, 0, 2, 2)
    val b = GeomOps.makeBox(1, 1, 3, 3)
    val c = GeomOps.makeBox(2, 2, 4, 4)
    val d = GeomOps.makeBox(5, 5, 6, 6)
    assert(GeomOps.intersects(a, b))
    assert(GeomOps.overlaps(a, b))
    assert(GeomOps.touches(a, c))
    assert(!GeomOps.overlaps(a, c))
    assert(GeomOps.disjoint(a, d))
    assert(GeomOps.contains(a, GeomOps.point(1, 1)))
    assert(!GeomOps.contains(a, GeomOps.point(0, 0))) // boundary not contained
    assert(GeomOps.covers(a, GeomOps.point(0, 0)))    // but covered
    assert(GeomOps.within(GeomOps.point(1, 1), a))
    assert(GeomOps.dwithin(GeomOps.point(0, 0), GeomOps.point(3, 4), 5.0))
    assert(!GeomOps.dwithin(GeomOps.point(0, 0), GeomOps.point(3, 4), 4.9))
  }

  test("buffer uses quad_segs=16 default (64-gon for a point)") {
    val b = GeomOps.buffer(GeomOps.point(0, 0), 2.0)
    assert(b.getNumPoints == 65) // 64 vertices + closing
    val expected = 32 * 4 * math.sin(math.Pi / 32)
    assert(math.abs(b.getArea - expected) < 1e-9)
  }

  test("overlay primitives: intersection/difference/union/symdiff areas") {
    val a = GeomOps.makeBox(0, 0, 2, 2)
    val b = GeomOps.makeBox(1, 1, 3, 3)
    assert(GeomOps.intersection(a, b).getArea == 1.0)
    assert(GeomOps.difference(a, b).getArea == 3.0)
    assert(GeomOps.union(a, b).getArea == 7.0)
    assert(GeomOps.symDifference(a, b).getArea == 6.0)
  }

  test("unionAll cascades") {
    val boxes = (0 until 10).map(i => GeomOps.makeBox(i, 0, i + 1, 1))
    assert(GeomOps.unionAll(boxes).getArea == 10.0)
  }

  test("convex hull of triangle points") {
    val mp = GeomOps.collect(Seq(GeomOps.point(0, 0), GeomOps.point(4, 0), GeomOps.point(0, 3)))
    assert(GeomOps.convexHull(mp).getArea == 6.0)
  }

  test("centroid, envelope, boundary") {
    val box = GeomOps.makeBox(0, 0, 2, 4)
    val c = GeomOps.centroid(box)
    assert(GeomOps.pointX(c) == 1.0 && GeomOps.pointY(c) == 2.0)
    assert(GeomOps.envelope(box).equalsTopo(box))
    assert(GeomOps.boundary(box).getLength == 12.0)
  }

  test("simplify removes collinear point") {
    val l = wkt("LINESTRING (0 0, 1 1, 2 2)")
    assert(GeomOps.simplify(l, 1e-9, preserveTopology = false).getNumPoints == 2)
  }

  test("make_valid fixes bowtie") {
    val bowtie = wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert(!bowtie.isValid)
    val fixed = GeomOps.makeValid(bowtie)
    assert(fixed.isValid)
    // the bowtie splits into two unit triangles on each side of the crossing
    assert(math.abs(fixed.getArea - 2.0) < 1e-12)
  }

  test("explode parts and collection extract") {
    val mp = wkt("MULTIPOINT ((0 0), (1 1), (2 2))")
    assert(GeomOps.parts(mp).length == 3)
    val mixed = wkt("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1), POLYGON ((0 0, 1 0, 1 1, 0 0)))")
    assert(GeomOps.collectionExtract(mixed, 2).getGeometryType == "Polygon")
    assert(GeomOps.collectionExtract(mixed, 0).getGeometryType == "Point")
  }

  test("affine ops") {
    val p = GeomOps.point(1, 1)
    val t = GeomOps.translate(p, 2, 3)
    assert(GeomOps.pointX(t) == 3.0 && GeomOps.pointY(t) == 4.0)
    val s = GeomOps.scale(p, 2, 2, 0, 0)
    assert(GeomOps.pointX(s) == 2.0)
    val r = GeomOps.rotate(p, 90, 0, 0)
    assert(math.abs(GeomOps.pointX(r) - (-1.0)) < 1e-12)
  }

  test("interpolate and project are inverse") {
    val l = wkt("LINESTRING (0 0, 10 0)")
    val p = GeomOps.interpolate(l, 0.25, normalized = true)
    assert(GeomOps.pointX(p) == 2.5)
    assert(GeomOps.project(l, p, normalized = true) == 0.25)
  }

  test("relate DE-9IM for point in polygon") {
    val box = GeomOps.makeBox(0, 0, 2, 2)
    assert(GeomOps.relate(GeomOps.point(1, 1), box) == "0FFFFF212")
  }

  test("delaunay/voronoi/polygonize produce geometry") {
    val mp = wkt("MULTIPOINT ((0 0), (4 0), (0 4), (4 4), (2 2))")
    assert(GeomOps.delaunayTriangles(mp, 0, onlyEdges = false).getNumGeometries == 4)
    assert(GeomOps.voronoiPolygons(mp, 0, onlyEdges = false).getNumGeometries == 5)
    val rings = Seq(wkt("LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)"))
    assert(GeomOps.polygonize(rings).getArea == 1.0)
  }

  test("orient_polygons normalizes ring winding") {
    val cw = wkt("POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))") // clockwise exterior
    val ccw = GeomOps.orientPolygons(cw, exteriorCw = false)
    assert(GeomOps.isCcw(GeomOps.exterior(ccw)))
    val backCw = GeomOps.orientPolygons(ccw, exteriorCw = true)
    assert(!GeomOps.isCcw(GeomOps.exterior(backCw)))
    assert(backCw.getArea == 4.0)
  }

  test("concave hull, constrained delaunay, shared paths, offset, sample") {
    val mp = wkt("MULTIPOINT ((0 0), (4 0), (0 4), (4 4), (2 2))")
    val hull = GeomOps.concaveHull(mp, 1.0, allowHoles = false)
    assert(hull.getArea > 0)
    val poly = wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(GeomOps.constrainedDelaunay(poly).getNumGeometries >= 2)
    val shared = GeomOps.sharedPaths(
      wkt("LINESTRING (0 0, 2 0, 4 0)"), wkt("LINESTRING (1 0, 3 0)"))
    assert(shared.getLength == 2.0)
    assert(GeomOps.offsetCurve(wkt("LINESTRING (0 0, 4 0)"), 1.0, 8, 1, 5.0).getLength > 0)
    val sampled = GeomOps.samplePoints(poly, 10, seed = 7)
    assert(sampled.getNumGeometries == 10)
    assert(poly.covers(sampled))
  }

  test("hausdorff and frechet distances") {
    val a = wkt("LINESTRING (0 0, 10 0)")
    val b = wkt("LINESTRING (0 3, 10 3)")
    assert(GeomOps.hausdorff(a, b) == 3.0)
    assert(GeomOps.frechet(a, b) == 3.0)
  }

  test("hilbert distance is locality-preserving and bounded") {
    val d00 = Hilbert.distance(0, 0, 0, 0, 100, 100, 10)
    val dMax = Hilbert.distance(100, 100, 0, 0, 100, 100, 10)
    assert(d00 == 0)
    assert(dMax < (1L << 20))
    // neighbours have closer codes than far points on average
    val a = Hilbert.distance(10, 10, 0, 0, 100, 100, 10)
    val b = Hilbert.distance(10.1, 10.1, 0, 0, 100, 100, 10)
    val far = Hilbert.distance(90, 90, 0, 0, 100, 100, 10)
    assert(math.abs(a - b) < math.abs(a - far))
  }
}

/** Property-style tests with seeded random geometry (beyond the reference's
  * example-based suite). */
class GeomPropertySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)
  private def randBox(): Geometry = {
    val x0 = rng.nextDouble() * 2000 - 1000
    val y0 = rng.nextDouble() * 2000 - 1000
    GeomOps.makeBox(x0, y0, x0 + 0.1 + rng.nextDouble() * 100, y0 + 0.1 + rng.nextDouble() * 100)
  }

  test("area is non-negative; intersection is subset (200 random pairs)") {
    (0 until 200).foreach { _ =>
      val a = randBox(); val b = randBox()
      assert(a.getArea >= 0)
      val i = GeomOps.intersection(a, b)
      assert(i.getArea <= math.min(a.getArea, b.getArea) + 1e-9)
    }
  }

  test("wkb roundtrip is identity for random boxes") {
    (0 until 200).foreach { _ =>
      val g = randBox()
      assert(Wkb.read(Wkb.write(g)).equalsExact(g))
    }
  }

  test("predicate consistency: within==flip(contains); disjoint==!intersects") {
    (0 until 200).foreach { _ =>
      val a = randBox(); val b = randBox()
      assert(GeomOps.within(a, b) == GeomOps.contains(b, a))
      assert(GeomOps.disjoint(a, b) == !GeomOps.intersects(a, b))
    }
  }
}
