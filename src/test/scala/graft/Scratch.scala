package graft

import graft.geom.{GeomOps, Wkb}

/** Throwaway behavior probe for round-10 oracle design (not a test). */
object Scratch {
  def w(g: org.locationtech.jts.geom.Geometry): String = Wkb.writeWkt(g)
  def main(args: Array[String]): Unit = {
    val r = Wkb.readWkt _
    // 1. normalize: canonical form of a box polygon
    println("norm box(1,2,4,7): " + w(GeomOps.normalize(GeomOps.makeBox(1, 2, 4, 7))))
    println("norm box(0,0,2,2): " + w(GeomOps.normalize(GeomOps.makeBox(0, 0, 2, 2))))
    println("raw  box(1,2,4,7): " + w(GeomOps.makeBox(1, 2, 4, 7)))
    println("norm multipoint: " + w(GeomOps.normalize(r("MULTIPOINT ((3 1), (1 2), (2 0))"))))
    println("norm line: " + w(GeomOps.normalize(r("LINESTRING (3 1, 0 0)"))))
    // 2. representative point of rectangle
    println("repr box(1,2,5,4): " + w(GeomOps.representativePoint(GeomOps.makeBox(1, 2, 5, 4))))
    println("repr box(0,0,3,7): " + w(GeomOps.representativePoint(GeomOps.makeBox(0, 0, 3, 7))))
    // 3. max inscribed circle of square, tolerance 1e-7
    val mic = GeomOps.maximumInscribedCircle(GeomOps.makeBox(0, 0, 3, 3), 1e-7)
    println("mic square3: " + w(mic))
    val micR = GeomOps.maximumInscribedCircle(GeomOps.makeBox(0, 0, 5, 2), 1e-7)
    println("mic rect 5x2: " + w(micR))
    // 4. offset curve of straight segment
    println("offset seg by 2: " + w(GeomOps.offsetCurve(r("LINESTRING (0 0, 10 0)"), 2.0, 8, 1, 5.0)))
    println("offset seg by -3: " + w(GeomOps.offsetCurve(r("LINESTRING (0 0, 10 0)"), -3.0, 8, 1, 5.0)))
    // 5. voronoi with extendTo box: 2x2 sites spaced 2 in box(0,0,4,4)
    val sites = GeomOps.collect(Seq(GeomOps.point(1,1), GeomOps.point(3,1), GeomOps.point(1,3), GeomOps.point(3,3)))
    val vor = GeomOps.voronoiPolygons(sites, 0.0, onlyEdges = false, GeomOps.makeBox(0, 0, 4, 4))
    println("voronoi extendTo: " + w(vor))
    // 6. delaunay of 3x3 unit grid
    val grid9 = GeomOps.collect(for { x <- 0 to 2; y <- 0 to 2 } yield GeomOps.point(x, y))
    val del = GeomOps.delaunayTriangles(grid9, 0.0, onlyEdges = false)
    println(s"delaunay 3x3: n=${del.getNumGeometries} area=${del.getArea}")
    // 7. polygonize 3x3 grid lines + polygonizeFull with dangle
    val k = 3
    val lines = (for (i <- 0 to k) yield r(s"LINESTRING (0 $i, $k $i)")) ++
                (for (i <- 0 to k) yield r(s"LINESTRING ($i 0, $i $k)"))
    val pz = GeomOps.polygonize(lines)
    println(s"polygonize grid3: n=${pz.getNumGeometries} area=${pz.getArea}")
    val withDangle = lines :+ r("LINESTRING (0 0, -2 -1)")
    val (p, cuts, dangles, invalid) = GeomOps.polygonizeFull(withDangle)
    println(s"pzfull: polys=${p.getNumGeometries} cuts=${cuts.getNumGeometries} dangles=${dangles.getNumGeometries} inv=${invalid.getNumGeometries}")
    // 8. shared paths: collinear overlap same dir + reversed
    val sp1 = GeomOps.sharedPaths(r("LINESTRING (0 0, 10 0)"), r("LINESTRING (2 0, 6 0)"))
    println("shared same-dir: " + w(sp1))
    val sp2 = GeomOps.sharedPaths(r("LINESTRING (0 0, 10 0)"), r("LINESTRING (6 0, 2 0)"))
    println("shared rev-dir: " + w(sp2))
    // 9. makeValid bowtie
    val bow = r("POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))")
    val mv = GeomOps.makeValid(bow)
    println(s"makeValid bowtie: ${w(mv)} area=${mv.getArea} n=${mv.getNumGeometries}")
    // 10. setPrecision point
    println("setPrec pt: " + w(GeomOps.setPrecision(r("POINT (1.2345 5.6789)"), 0.1)))
    println("setPrec pt2: " + w(GeomOps.setPrecision(r("POINT (1.25 -5.65)"), 0.1)))
    // 11. concave hull ratio 1 of box corners
    println("concave r1: " + w(GeomOps.concaveHull(GeomOps.makeBox(0, 0, 4, 2), 1.0, false)) )
    // 12. minimum bounding circle bounds
    val mbc = GeomOps.minimumBoundingCircle(GeomOps.makeBox(0, 0, 6, 2))
    val (bx0, by0, bx1, by1) = GeomOps.bounds(mbc)
    println(s"mbc bounds: $bx0 $by0 $bx1 $by1 (expect center 3,1 r=sqrt(10)=${math.sqrt(10)})")
    // 13. simplifyCoverage: two rects sharing a zigzag boundary
    // left: (0,0)-(2,2) but right edge zigzags around x=2 by +-0.2; right: (2,0)-(4,2) mirror
    val leftZ = r("POLYGON ((0 0, 0 2, 2 2, 1.8 1.5, 2.2 1.0, 1.8 0.5, 2 0, 0 0))")
    val rightZ = r("POLYGON ((2 0, 1.8 0.5, 2.2 1.0, 1.8 1.5, 2 2, 4 2, 4 0, 2 0))")
    val simp = GeomOps.simplifyCoverage(Seq(leftZ, rightZ), 0.5)
    simp.foreach(g => println(s"simpcov: ${w(g)} area=${g.getArea}"))
    // 14. constrained delaunay of L-shape
    val ell = r("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    val cdt = GeomOps.constrainedDelaunay(ell)
    println(s"cdt L: n=${cdt.getNumGeometries} area=${cdt.getArea}")
    // 15. canonical wkt ops
    println("lineMerge: " + w(GeomOps.lineMerge(r("MULTILINESTRING ((0 0, 5 0), (5 0, 5 3))"))))
    println("uniquePts: " + w(GeomOps.extractUniquePoints(r("LINESTRING (0 0, 5 0, 5 0, 5 3, 0 0)"))))
    println("rmRepeat: " + w(GeomOps.removeRepeatedPoints(r("LINESTRING (0 0, 0 0, 5 0, 5 0, 5 3)"), 0.0)))
    println("force2d: " + w(GeomOps.force2d(r("POINT Z (3 4 9)"))))
    println("exterior: " + w(GeomOps.exterior(GeomOps.makeBox(0, 0, 2, 3))))
    println("orientCCW box: " + w(GeomOps.orientPolygons(GeomOps.makeBox(0, 0, 2, 3), exteriorCw = false)))
    println("orientCW box: " + w(GeomOps.orientPolygons(GeomOps.makeBox(0, 0, 2, 3), exteriorCw = true)))
    println("getGeomN(1): " + w(GeomOps.getGeometryN(r("MULTIPOINT ((1 2), (3 4), (5 6))"), 1)))
    // 16. sample points
    val sp = GeomOps.samplePoints(GeomOps.makeBox(0, 0, 5, 5), 10, 42L)
    println(s"samplePts: n=${sp.getNumGeometries} within=${sp.within(GeomOps.makeBox(0, 0, 5, 5))}")
    val sp1b = GeomOps.samplePoints(GeomOps.makeBox(0, 0, 5, 5), 10, 42L)
    println(s"samplePts deterministic: ${sp.equalsExact(sp1b)}")
    // 17. hausdorff/frechet shifted segments
    val a = r("LINESTRING (0 0, 10 0)"); val b = r("LINESTRING (0 3, 14 3)")
    println(s"hausdorff: ${GeomOps.hausdorff(a, b)} expect ${math.sqrt(16 + 9)}")
    println(s"frechet: ${GeomOps.frechet(a, b)}")
    // 18. shortest line + project
    val seg = r("LINESTRING (0 2, 10 2)")
    println("shortest: " + w(GeomOps.shortestLine(r("POINT (13 7)"), seg)))
    println(s"project: ${GeomOps.project(seg, r("POINT (13 7)"), normalized = false)}")
    println(s"projectN: ${GeomOps.project(seg, r("POINT (-3 7)"), normalized = true)}")
    // 19. transformCoords
    println("transform: " + w(GeomOps.transformCoords(r("LINESTRING (1 2, 3 4)"), (x, y, z) => (x + 1, 2 * y, z))))
    // 20. buildArea: outer ring + hole ring
    val ringsColl = GeomOps.collect(Seq(
      GeomOps.boundary(GeomOps.makeBox(0, 0, 4, 4)), GeomOps.boundary(GeomOps.makeBox(1, 1, 2, 2))))
    val ba = GeomOps.buildArea(ringsColl)
    println(s"buildArea: ${w(ba)} area=${ba.getArea}")
    // 21. polygonize with NODED unit segments (k=3)
    val segs = (for { i <- 0 until k; j <- 0 to k } yield r(s"LINESTRING ($i $j, ${i + 1} $j)")) ++
               (for { i <- 0 to k; j <- 0 until k } yield r(s"LINESTRING ($i $j, $i ${j + 1})"))
    val pz2 = GeomOps.polygonize(segs)
    println(s"polygonize noded3: n=${pz2.getNumGeometries} area=${pz2.getArea}")
    val (p2, c2, d2, i2) = GeomOps.polygonizeFull(segs :+ r("LINESTRING (0 0, -1 -1)"))
    println(s"pzfull noded: polys=${p2.getNumGeometries} cuts=${c2.getNumGeometries} dangles=${d2.getNumGeometries} inv=${i2.getNumGeometries} dWkt=${w(d2)}")
    // 22. uniquePts after fix
    println("uniquePts fixed: " + w(GeomOps.extractUniquePoints(r("LINESTRING (0 0, 5 0, 5 0, 5 3, 0 0)"))))
    // 23. mic other scales
    for (s <- Seq(1, 2, 5, 7)) {
      val m = GeomOps.maximumInscribedCircle(GeomOps.makeBox(0, 0, s, s), 1e-7)
      val cs = m.getCoordinates
      println(s"mic sq$s: center=(${cs(0).x},${cs(0).y}) r=${m.getLength}")
    }
    // 24. voronoi 3x3 sites in box(0,0,6,6)
    val sites9 = GeomOps.collect(for { x <- 0 until 3; y <- 0 until 3 } yield GeomOps.point(2 * x + 1, 2 * y + 1))
    val vor9 = GeomOps.voronoiPolygons(sites9, 0.0, onlyEdges = false, GeomOps.makeBox(0, 0, 6, 6))
    val areas = (0 until vor9.getNumGeometries).map(vor9.getGeometryN(_).getArea)
    println(s"voronoi9: n=${vor9.getNumGeometries} areas=${areas.sorted.mkString(",")}")
    // 25. frechet on parallel same-length segments with more vertices
    println(s"frechet para: ${GeomOps.frechet(r("LINESTRING (0 0, 4 0, 10 0)"), r("LINESTRING (0 3, 4 3, 10 3)"))}")
    // 26. delaunay 4x4 and 2x2
    for (kk <- Seq(2, 4)) {
      val g2 = GeomOps.collect(for { x <- 0 until kk; y <- 0 until kk } yield GeomOps.point(x, y))
      val dl = GeomOps.delaunayTriangles(g2, 0.0, onlyEdges = false)
      println(s"delaunay ${kk}x$kk: n=${dl.getNumGeometries} area=${dl.getArea}")
    }
    // 27. simplifyCoverage translated copy (t=3)
    val t = 3
    val lz = r(s"POLYGON ((0 ${t}, 0 ${t + 2}, 2 ${t + 2}, 1.8 ${t + 1.5}, 2.2 ${t + 1.0}, 1.8 ${t + 0.5}, 2 ${t}, 0 ${t}))")
    val rz = r(s"POLYGON ((2 ${t}, 1.8 ${t + 0.5}, 2.2 ${t + 1.0}, 1.8 ${t + 1.5}, 2 ${t + 2}, 4 ${t + 2}, 4 ${t}, 2 ${t}))")
    GeomOps.simplifyCoverage(Seq(lz, rz), 0.5).foreach(g => println(s"simpcov t3: area=${g.getArea}"))
  }
}
