package graft

import graft.geom.{GeomOps, Hilbert, Wkb}
import org.locationtech.jts.geom.{Coordinate, Geometry}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based laws over the pure geometry kernel (SURVEY §5: scalacheck
  * invariants the reference's example-based suite cannot cover — WKB
  * round-trip identity, measure positivity, set-operation containment,
  * predicate ↔ DE-9IM consistency). Pure JVM, no Spark session. */
object GeomProperties extends Properties("graft.geom") {

  private val f = Wkb.factory
  private val coord: Gen[Double] = Gen.chooseNum(-1000.0, 1000.0)
    .map(x => math.rint(x * 64) / 64) // exact in binary — keeps laws FP-robust

  private val genPoint: Gen[Geometry] =
    for (x <- coord; y <- coord) yield f.createPoint(new Coordinate(x, y))

  private val genBox: Gen[Geometry] =
    for (x0 <- coord; y0 <- coord; w <- Gen.chooseNum(0.5, 200.0); h <- Gen.chooseNum(0.5, 200.0))
      yield GeomOps.makeBox(x0, y0, x0 + math.rint(w * 64) / 64, y0 + math.rint(h * 64) / 64)

  private val genLine: Gen[Geometry] =
    for (n <- Gen.chooseNum(2, 8); cs <- Gen.listOfN(n, Gen.zip(coord, coord)))
      yield f.createLineString(cs.map { case (x, y) => new Coordinate(x, y) }.toArray)

  /** Convex hull of ≥3 random points — always a valid polygon (or a
    * degenerate line/point, which the laws must also survive). */
  private val genHullPoly: Gen[Geometry] =
    for (n <- Gen.chooseNum(3, 12); cs <- Gen.listOfN(n, Gen.zip(coord, coord)))
      yield f.createMultiPointFromCoords(cs.map { case (x, y) => new Coordinate(x, y) }.toArray).convexHull()

  private val genGeom: Gen[Geometry] = Gen.oneOf(genPoint, genBox, genLine, genHullPoly)

  property("WKB round-trip is identity") = forAll(genGeom) { g =>
    Wkb.read(Wkb.write(g)).equalsExact(g)
  }

  property("WKT round-trip preserves topology") = forAll(genGeom) { g =>
    // equalsTopo is undefined (false even reflexively) for degenerate
    // geometries — e.g. the collapsed line LINESTRING (x y, x y) that
    // genLine can emit when two sampled vertices coincide — so accept
    // exact coordinate equality as the fallback law for those.
    val back = Wkb.readWkt(g.toText)
    back.equalsTopo(g) || back.equalsExact(g) || g.isEmpty
  }

  property("area and length are non-negative") = forAll(genGeom) { g =>
    g.getArea >= 0.0 && g.getLength >= 0.0
  }

  property("envelope contains the geometry and has >= area") = forAll(genGeom) { g =>
    g.getEnvelope.covers(g) && g.getEnvelope.getArea >= g.getArea - 1e-9
  }

  property("convex hull covers the geometry") = forAll(genGeom) { g =>
    g.convexHull().covers(g)
  }

  property("intersection is within both operands (boxes)") = forAll(genBox, genBox) { (a, b) =>
    val i = a.intersection(b)
    i.isEmpty || (a.covers(i) && b.covers(i))
  }

  property("union covers both; area bounded by sum (boxes)") = forAll(genBox, genBox) { (a, b) =>
    val u = a.union(b)
    u.covers(a) && u.covers(b) &&
      u.getArea <= a.getArea + b.getArea + 1e-6 &&
      u.getArea >= math.max(a.getArea, b.getArea) - 1e-6
  }

  property("inclusion-exclusion: area(u) = area(a)+area(b)-area(i) (boxes)") =
    forAll(genBox, genBox) { (a, b) =>
      val u = a.union(b).getArea
      val i = a.intersection(b).getArea
      math.abs(u - (a.getArea + b.getArea - i)) <= 1e-6 * math.max(1.0, u)
    }

  property("intersects <=> not disjoint, and matches the DE-9IM relate") =
    forAll(genGeom, genGeom) { (a, b) =>
      val im = a.relate(b)
      a.intersects(b) == !a.disjoint(b) && a.intersects(b) == im.isIntersects
    }

  property("contains(a,b) <=> within(b,a), and within implies the T*F**F*** pattern") =
    forAll(genBox, genGeom) { (a, b) =>
      val c = a.contains(b)
      c == b.within(a) && (!c || b.relate(a).matches("T*F**F***"))
    }

  property("dwithin(d) <=> distance <= d") = forAll(genGeom, genGeom, Gen.chooseNum(0.0, 500.0)) {
    (a, b, d) =>
      // isWithinDistance uses the same DistanceOp — must agree with distance()
      a.isWithinDistance(b, d) == (a.distance(b) <= d)
  }

  property("translate preserves area and length") = forAll(genHullPoly, coord, coord) { (g, dx, dy) =>
    val t = GeomOps.translate(g, dx, dy)
    math.abs(t.getArea - g.getArea) <= 1e-6 * math.max(1.0, g.getArea) &&
      math.abs(t.getLength - g.getLength) <= 1e-6 * math.max(1.0, g.getLength)
  }

  property("scale(s) multiplies area by s^2") = forAll(genHullPoly, Gen.chooseNum(0.25, 4.0)) {
    (g, s) =>
      val t = GeomOps.scale(g, s, s, 0, 0)
      math.abs(t.getArea - g.getArea * s * s) <= 1e-6 * math.max(1.0, g.getArea * s * s)
  }

  property("buffer contains the original (positive distance)") =
    forAll(genGeom, Gen.chooseNum(0.1, 50.0)) { (g, d0) =>
      // scalacheck's Double shrinker can escape the generator's lower bound
      // (shrinks 0.1 → 0.0, where a line's buffer is rightly empty) — clamp
      val d = math.max(d0, 0.1)
      // JTS buffers a COLLAPSED line (zero length, e.g. both endpoints
      // coincident from the 1/64-grid generator) to an empty polygon, and
      // degenerate geometries are outside the law's domain anyway
      val collapsedLine = g.getDimension == 1 && g.getLength == 0.0
      GeomOps.buffer(g, d).covers(g) || collapsedLine
    }

  property("simplify never adds vertices") = forAll(genLine, Gen.chooseNum(0.0, 10.0)) { (g, tol) =>
    GeomOps.simplify(g, tol, preserveTopology = true).getNumPoints <= g.getNumPoints
  }

  property("hilbert distance stays in [0, 4^order)") =
    forAll(Gen.chooseNum(-500.0, 500.0), Gen.chooseNum(-500.0, 500.0)) { (x, y) =>
      val order = 10
      val d = Hilbert.distance(x, y, -500, -500, 500, 500, order)
      d >= 0 && d < (1L << (2 * order))
    }

  property("snap within tolerance moves the point onto the target") =
    forAll(genPoint, genPoint) { (a, b) =>
      val far = a.distance(b)
      val snapped = GeomOps.snap(a, b, far + 1.0)
      snapped.equalsExact(b) || far == 0.0
    }
}
