package graft.io

import graft.geom.{GeomOps, Wkb}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property laws for the two newest HAND-WRITTEN text codecs (round-20
  * advice: the MIF empty-MID-line alignment bug was exactly the class
  * random round-trip laws catch). Pure text-level, no Spark session:
  *
  *  - DXF: random write->read round-trip over generated frames, stray
  *    blank lines RESYNC (never desync subsequent pairs), whitespace
  *    padding on code/numeric lines is transparent while layer-name
  *    whitespace is preserved, malformed group codes raise loudly, and
  *    the ELLIPSE/SPLINE densifiers obey their closed-form invariants.
  *  - MIF/MID: geometry-record grammar round-trips every supported shape,
  *    MID quoting round-trips delimiter/quote-bearing strings and typed
  *    values, and null-heavy rows (empty MID lines) keep row ALIGNMENT.
  */
object CodecProperties extends Properties("graft.io.codecs") {

  private val f = Wkb.factory
  private val coord: Gen[Double] = Gen.chooseNum(-1000.0, 1000.0)
    .map(x => math.rint(x * 64) / 64) // dyadic — exact through any decimal print

  private val layerName: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
  } yield (head :: tail).mkString.trim match { case "" => "L"; case s => s }

  private val genPoint2d: Gen[Geometry] =
    for (x <- coord; y <- coord) yield f.createPoint(new Coordinate(x, y))
  private val genPoint3d: Gen[Geometry] =
    for (x <- coord; y <- coord; z <- coord) yield f.createPoint(new Coordinate(x, y, z))
  private val genLine2d: Gen[Geometry] = for {
    n <- Gen.chooseNum(2, 8)
    cs <- Gen.listOfN(n, Gen.zip(coord, coord))
    if cs.distinct.length == cs.length
  } yield f.createLineString(cs.map { case (x, y) => new Coordinate(x, y) }.toArray)
  private val genLine3d: Gen[Geometry] = for {
    n <- Gen.chooseNum(2, 6)
    cs <- Gen.listOfN(n, Gen.zip(Gen.zip(coord, coord), coord))
    if cs.map(_._1).distinct.length == cs.length
  } yield f.createLineString(cs.map { case ((x, y), z) => new Coordinate(x, y, z) }.toArray)

  /** Outer box with 0-2 disjoint holes strictly inside. */
  private val genPolyWithHoles: Gen[Geometry] = for {
    x0 <- coord; y0 <- coord
    w <- Gen.chooseNum(32.0, 128.0).map(v => math.rint(v * 64) / 64)
    h <- Gen.chooseNum(32.0, 128.0).map(v => math.rint(v * 64) / 64)
    nh <- Gen.chooseNum(0, 2)
  } yield {
    val shell = GeomOps.makeBox(x0, y0, x0 + w, y0 + h)
      .asInstanceOf[org.locationtech.jts.geom.Polygon].getExteriorRing
    // holes in fixed disjoint quadrant slots — always valid
    val slots = Seq((0.1, 0.1), (0.55, 0.55))
    val holes = slots.take(nh).map { case (fx, fy) =>
      f.createLinearRing(GeomOps.makeBox(
        x0 + fx * w, y0 + fy * h, x0 + (fx + 0.3) * w, y0 + (fy + 0.3) * h)
        .asInstanceOf[org.locationtech.jts.geom.Polygon].getExteriorRing.getCoordinates)
    }
    f.createPolygon(f.createLinearRing(shell.getCoordinates), holes.toArray)
  }

  private val genDxfGeom: Gen[Geometry] =
    Gen.oneOf(genPoint2d, genPoint3d, genLine2d, genLine3d, genPolyWithHoles)

  private def dxfDoc(entities: Seq[String]): String =
    "0\nSECTION\n2\nENTITIES\n" + entities.mkString + "0\nENDSEC\n0\nEOF\n"

  /** Write->read comparison: points/lines exact; polygons topological (the
    * HATCH even-odd assembly may renumber/reorient rings). */
  private def sameGeom(a: Geometry, b: Geometry): Boolean = a match {
    case _: org.locationtech.jts.geom.Polygon => a.norm().equalsExact(b.norm())
    case _ => a.norm().equalsExact(b.norm())
  }

  property("DXF write->read round-trips entities with layers (generated frames)") =
    forAll(Gen.listOfN(4, Gen.zip(genDxfGeom, layerName))) { ents =>
      val text = dxfDoc(ents.zipWithIndex.map { case ((g, l), i) =>
        Dxf.renderEntity(g, l, 256L + i)
      })
      val back = Dxf.parseEntities(text)
      back.length == ents.length && back.zip(ents).forall {
        case ((layer, _, got), (want, wantLayer)) =>
          layer == wantLayer && sameGeom(want, got)
      }
    }

  property("DXF stray blank lines resync, never desync later entities") =
    forAll(Gen.zip(Gen.listOfN(3, Gen.zip(genDxfGeom, layerName)),
        Gen.listOfN(3, Gen.chooseNum(0, 1000)))) { case (ents, positions) =>
      val text = dxfDoc(ents.zipWithIndex.map { case ((g, l), i) =>
        Dxf.renderEntity(g, l, 300L + i)
      })
      val lines = text.linesIterator.toIndexedSeq
      // inject blanks at CODE boundaries (even line indices: the rendered
      // doc is strictly alternating, no blanks of its own)
      val at = positions.map(p => (p % (lines.length / 2)) * 2).distinct.sorted.reverse
      val mutated = at.foldLeft(lines) { (ls, i) =>
        (ls.take(i) :+ "") ++ ls.drop(i)
      }.mkString("\n")
      val a = Dxf.parseEntities(text)
      val b = Dxf.parseEntities(mutated)
      a.length == b.length && a.zip(b).forall { case ((l1, _, g1), (l2, _, g2)) =>
        l1 == l2 && g1.norm().equalsExact(g2.norm())
      }
    }

  property("DXF whitespace padding on code/numeric lines is transparent") =
    forAll(Gen.zip(Gen.listOfN(3, Gen.zip(genDxfGeom, layerName)),
        Gen.chooseNum(1, 4))) { case (ents, pad) =>
      val text = dxfDoc(ents.zipWithIndex.map { case ((g, l), i) =>
        Dxf.renderEntity(g, l, 310L + i)
      })
      val sp = " " * pad
      val mutated = text.linesIterator.zipWithIndex.map { case (line, i) =>
        val isCode = i % 2 == 0
        val numeric = try { line.trim.toDouble; true } catch { case _: Exception => false }
        // layer names are alphabetic by generation, so "numeric" can only
        // hit coordinate/flag VALUES (where padding must be transparent)
        if (isCode || numeric) sp + line + sp else line
      }.mkString("\n")
      val a = Dxf.parseEntities(text)
      val b = Dxf.parseEntities(mutated)
      a.length == b.length && a.zip(b).forall { case ((l1, _, g1), (l2, _, g2)) =>
        l1 == l2 && g1.norm().equalsExact(g2.norm())
      }
    }

  property("DXF malformed group-code lines raise loudly (never silent drops)") =
    forAll(Gen.zip(genDxfGeom, layerName, Gen.chooseNum(0, 1000))) { case (g, l, p) =>
      val text = dxfDoc(Seq(Dxf.renderEntity(g, l, 320L)))
      val lines = text.linesIterator.toIndexedSeq
      val at = (p % (lines.length / 2)) * 2 // a code position
      val mutated = (lines.take(at) :+ "notacode") ++ lines.drop(at + 1) // replace code line
      Prop.throws(classOf[IllegalArgumentException])(Dxf.parseEntities(mutated.mkString("\n")))
    }

  property("DXF ELLIPSE densification lies exactly on the parametric ellipse") =
    forAll(for {
      cx <- coord; cy <- coord
      mx <- Gen.chooseNum(1.0, 500.0); my <- Gen.chooseNum(-500.0, 500.0)
      ratio <- Gen.chooseNum(0.05, 1.0)
      t0 <- Gen.chooseNum(0.0, 6.0)
      sweep <- Gen.chooseNum(0.3, 2 * math.Pi)
    } yield (cx, cy, mx, my, ratio, t0, t0 + sweep)) {
      case (cx, cy, mx, my, ratio, t0, t1) =>
        val cs = Dxf.ellipseCoords(cx, cy, mx, my, ratio, t0, t1)
        // invert the affine map: p = c + A cos t + B sin t with B = r*perp(A)
        // => cos t = (A . (p-c))/|A|^2, sin t = (B . (p-c))/|B|^2
        val a2 = mx * mx + my * my
        cs.forall { p =>
          val dx = p.x - cx; val dy = p.y - cy
          val ct = (mx * dx + my * dy) / a2
          val st = (-my * dx + mx * dy) / (ratio * a2)
          math.abs(ct * ct + st * st - 1.0) < 1e-9
        }
    }

  property("DXF SPLINE (clamped, unit weights): endpoint interpolation + convex hull") =
    forAll(for {
      deg <- Gen.chooseNum(2, 4)
      extra <- Gen.chooseNum(1, 4)
      cs <- Gen.listOfN(deg + extra, Gen.zip(coord, coord))
      if cs.distinct.length == cs.length
    } yield (deg, cs)) { case (deg, cs) =>
      val n = cs.length
      val ctrl = cs.map { case (x, y) => new Coordinate(x, y) }.toArray
      // clamped uniform knots: deg+1 zeros, interior 1..m, deg+1 max
      val interior = n - deg - 1
      val knots = Array.fill(deg + 1)(0.0) ++
        (1 to interior).map(_.toDouble) ++ Array.fill(deg + 1)(interior + 1.0)
      val out = Dxf.splineCoords(deg, knots, ctrl, Array.fill(n)(1.0), samples = 64)
      val hull = f.createMultiPointFromCoords(ctrl).convexHull().buffer(1e-6)
      out.head.distance(ctrl.head) < 1e-9 && out.last.distance(ctrl.last) < 1e-9 &&
        out.forall(c => hull.covers(f.createPoint(c)))
    }

  property("DXF INSERT expansion matches the closed-form affine transform") =
    forAll(for {
      bx <- coord; by <- coord; px <- coord; py <- coord
      ix <- coord; iy <- coord
      sx <- Gen.chooseNum(0.5, 3.0); sy <- Gen.chooseNum(0.5, 3.0)
      rot <- Gen.chooseNum(0.0, 360.0)
    } yield (bx, by, px, py, ix, iy, sx, sy, rot)) {
      case (bx, by, px, py, ix, iy, sx, sy, rot) =>
        val text =
          "0\nSECTION\n2\nBLOCKS\n" +
            s"0\nBLOCK\n8\n0\n2\nB\n10\n$bx\n20\n$by\n" +
            s"0\nPOINT\n8\n0\n10\n$px\n20\n$py\n" +
            "0\nENDBLK\n0\nENDSEC\n" +
            "0\nSECTION\n2\nENTITIES\n" +
            s"0\nINSERT\n8\nL\n2\nB\n10\n$ix\n20\n$iy\n41\n$sx\n42\n$sy\n50\n$rot\n" +
            "0\nENDSEC\n0\nEOF\n"
        val ents = Dxf.parseEntities(text)
        val got = ents.head._3.getCoordinate
        val r = math.toRadians(rot)
        val dx0 = (px - bx) * sx; val dy0 = (py - by) * sy
        val ex = ix + dx0 * math.cos(r) - dy0 * math.sin(r)
        val ey = iy + dx0 * math.sin(r) + dy0 * math.cos(r)
        ents.length == 1 && ents.head._1 == "L" &&
          math.abs(got.x - ex) < 1e-9 && math.abs(got.y - ey) < 1e-9
    }

  // ------------------------------------------------------------------ MIF

  private val genMifGeom: Gen[Geometry] = Gen.oneOf(
    genPoint2d, genLine2d, genPolyWithHoles,
    Gen.listOfN(4, Gen.zip(coord, coord)).map(cs =>
      f.createMultiPointFromCoords(cs.distinct.map { case (x, y) => new Coordinate(x, y) }.toArray)),
    Gen.listOfN(2, genLine2d).map(ls =>
      f.createMultiLineString(ls.map(_.asInstanceOf[org.locationtech.jts.geom.LineString]).toArray)))

  private def mifDoc(records: Seq[String]): String =
    "VERSION 300\nDELIMITER \",\"\nCOLUMNS 0\nDATA\n" + records.mkString("\n") + "\n"

  property("MIF geometry records round-trip every supported shape") =
    forAll(Gen.listOfN(3, genMifGeom)) { gs =>
      val text = mifDoc(gs.map(g => MapInfoMif.renderGeometry(Some(g))))
      val back = MapInfoMif.parseGeometries(text)
      back.length == gs.length && back.zip(gs).forall {
        case (Some(got), want) => got.norm().equalsExact(want.norm())
        case _                 => false
      }
    }

  property("MIF unsupported drawn-shape records raise loudly") =
    forAll(genMifGeom) { g =>
      val text = mifDoc(Seq(MapInfoMif.renderGeometry(Some(g)),
        "TEXT \"x\" 1 2 3 4"))
      Prop.throws(classOf[Exception])(MapInfoMif.parseGeometries(text))
    }

  private val midSchema = Array(
    StructField("name", StringType), StructField("n", IntegerType),
    StructField("score", DoubleType), StructField("ok", BooleanType))
  private val genMidValue: Gen[(Any, Any, Any, Any)] = for {
    s <- Gen.oneOf(
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', ' ', ';'))).map(_.mkString),
      Gen.const(null))
    n <- Gen.oneOf(Gen.chooseNum(-1000000, 1000000).map(Int.box), Gen.const(null))
    d <- Gen.oneOf(coord.map(Double.box), Gen.const(null))
    b <- Gen.oneOf(Gen.oneOf(true, false).map(Boolean.box), Gen.const(null))
  } yield (s, n, d, b)

  property("MID rows round-trip typed values incl. quoting and NULL alignment") =
    forAll(Gen.listOfN(6, genMidValue)) { rows =>
      val hdr = MapInfoMif.MifHeader(',',
        midSchema.map(fd => (fd.name, fd.dataType)), None)
      val text = rows.map { case (s, n, d, b) =>
        MapInfoMif.renderMidRow(Row(s, n, d, b), midSchema)
      }.mkString("\n")
      val back = MapInfoMif.parseMid(text, hdr)
      // the MID grammar has no null/""-string distinction: a null string
      // round-trips as "" (documented); other types round-trip typed nulls
      back.length == rows.length && back.zip(rows).forall {
        case (got, (s, n, d, b)) =>
          got(0) == (if (s == null) "" else s) && got(1) == n &&
            (got(2) == d || (d != null && math.abs(got(2).asInstanceOf[Double] -
              d.asInstanceOf[Double]) < 1e-12)) && got(3) == b
      }
    }

  property("MID all-null rows (EMPTY lines) keep row alignment") =
    forAll(Gen.listOfN(8, Gen.oneOf(true, false))) { nullMask =>
      val hdr = MapInfoMif.MifHeader(',', Array(("name", StringType: DataType)), None)
      val rows = nullMask.zipWithIndex.map { case (isNull, i) =>
        if (isNull) Row(null) else Row(s"v$i")
      }
      val schema = Array(StructField("name", StringType))
      val text = rows.map(MapInfoMif.renderMidRow(_, schema)).mkString("\n")
      val back = MapInfoMif.parseMid(text, hdr)
      // contract: INTERIOR empty lines are rows (alignment never shifts);
      // TRAILING empty lines are indistinguishable from editor artifacts
      // and may drop — the reader pads them back from the geometry count
      val lastReal = nullMask.lastIndexWhere(m => !m)
      back.length >= lastReal + 1 && back.length <= rows.length &&
        back.zipWithIndex.forall { case (got, i) =>
          got(0) == (if (nullMask(i)) "" else s"v$i")
        }
    }
}
