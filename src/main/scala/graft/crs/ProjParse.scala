package graft.crs

import graft.crs.CrsTransform._

/** Parameter-driven projection resolution for CRS definitions that arrive as
  * WKT1 (OGC/ESRI `.prj`), WKT2, or PROJJSON (GeoParquet `crs` values). The
  * reference delegates this to pyproj/PROJ (`geopandas/array.py:1098-1187`);
  * offline on the JVM we extract the projection method + parameters and
  * instantiate the matching family from [[CrsTransform]] — LCC 1SP/2SP,
  * Transverse Mercator, Albers Equal Area, Mercator (1SP/2SP/pseudo),
  * oblique/double stereographic, Lambert azimuthal equal area, cylindrical
  * equal area, polar stereographic (variant A at its UPS shape, variant B),
  * Equal Earth, Mollweide, sinusoidal, Eckert IV, Hotine Oblique Mercator
  * (variants A/B incl. the Swiss/RSO forms), Krovak, Cassini-Soldner,
  * equidistant cylindrical / Plate Carrée. This means any
  * state-plane/national-grid CRS in those families works from its full
  * definition, not just the EPSG codes in [[CrsTransform.forEpsg]].
  *
  * The datum step to the WGS84 hub honors a declared WKT1 `TOWGS84` clause
  * (3- or 7-parameter position-vector Helmert, composed in front of the
  * projection); absent one it is a null transformation (ESRI's default):
  * centimetric for NAD83/GRS80/ETRS89, meters-scale for legacy datums
  * (NAD27, OSGB36) — same documented posture as the 269xx UTM handling.
  * Compound CRS (horizontal + vertical) resolve to their horizontal member.
  * The projection math itself is exact per Snyder/EPSG GN7-2.
  */
object ProjParse {

  private val DegToRad = 0.017453292519943295

  /** Parse a CRS definition to a transform to/from its geographic base.
    * None when the string is not parseable or the method is unsupported. */
  def parse(crs: String): Option[CrsTransform] = {
    val s = crs.trim
    if (s.isEmpty) None
    else if (s.startsWith("{")) parseProjJson(s)
    else {
      val up = s.toUpperCase
      if (up.startsWith("COMPD_CS") || up.startsWith("COMPOUNDCRS")) {
        // compound horizontal+vertical: the vertical axis is out of engine
        // scope (heights pass through untouched) — resolve the horizontal
        // member, which is the first nested PROJCS/PROJCRS/GEOGCS clause
        val i = Seq("PROJCS", "PROJCRS", "GEOGCS", "GEOGCRS")
          .map(up.indexOf(_, 8)).filter(_ >= 0).sorted.headOption.getOrElse(return None)
        // bracket-match the horizontal member so the trailing VERT_CS (whose
        // UNIT clause would otherwise be mistaken for the projected axis
        // unit, e.g. ftUS horizontal + metre vertical) is excluded
        parse(extractBalanced(s, i).getOrElse(return None))
      }
      else if (up.startsWith("GEOGCS") || up.startsWith("GEOGCRS") || up.startsWith("GEODCRS"))
        // geographic: the TOWGS84 datum shift when declared, else the null
        // shift to the WGS84 hub
        Some(toWgs84Helmert(s).map(h => DatumProjected(h, Identity): CrsTransform)
          .getOrElse(Identity))
      else if (up.startsWith("PROJCS") || up.startsWith("PROJCRS")) parseWkt(s)
      else None
    }
  }

  // ------------------------------------------------------------------- WKT

  private val SpheroidRe =
    """(?i)(?:SPHEROID|ELLIPSOID)\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)\s*,\s*([-0-9.eE+]+)""".r
  private val MethodRe =
    """(?i)(?:PROJECTION|METHOD)\s*\[\s*"([^"]+)"""".r
  // value, then optionally that parameter's own unit clause (WKT2)
  private val ParamRe =
    ("""(?i)PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)\s*""" +
      """(?:,\s*(ANGLEUNIT|LENGTHUNIT|SCALEUNIT)\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+))?""").r
  // WKT1 projected unit is the LAST top-level UNIT[...]; WKT2 axis units are
  // the trailing LENGTHUNIT[...] clauses — in both dialects the last
  // length-unit clause in the string is the projected axis unit.
  private val UnitRe =
    """(?i)(?:\bUNIT|LENGTHUNIT)\s*\[\s*"([^"]*)"\s*,\s*([-0-9.eE+]+)""".r
  private val PrimeMRe =
    """(?i)PRIMEM\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)""".r
  private val ToWgs84Re =
    """(?i)TOWGS84\s*\[\s*([-0-9.eE+,\s]+)\]""".r

  /** The WKT1 TOWGS84 clause (3 or 7 position-vector parameters, source
    * datum -> WGS84) as this engine's WGS84 -> target [[Helmert]] (negated
    * convention, like the wired OSGB36/CH1903 registrations). None when the
    * clause is absent or all-zero (null shift — the default posture). */
  /** Substring of `s` from `start` through the close bracket matching the
    * first open bracket at/after `start`. Handles both WKT bracket dialects
    * (`[]` and `()`) and skips brackets inside double-quoted names. */
  private def extractBalanced(s: String, start: Int): Option[String] = {
    var i = start
    while (i < s.length && s(i) != '[' && s(i) != '(') i += 1
    if (i >= s.length) return None
    var depth = 0; var inQuote = false
    var j = i
    while (j < s.length) {
      val c = s(j)
      if (c == '"') inQuote = !inQuote
      else if (!inQuote && (c == '[' || c == '(')) depth += 1
      else if (!inQuote && (c == ']' || c == ')')) {
        depth -= 1
        if (depth == 0) return Some(s.substring(start, j + 1))
      }
      j += 1
    }
    None
  }

  private def toWgs84Helmert(s: String): Option[Helmert] = {
    val (a, invF) = SpheroidRe.findFirstMatchIn(s)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble))
      .getOrElse((WGS84_A, 1 / WGS84_F))
    val f = if (invF.isInfinite || invF == 0) 0.0 else 1 / invF
    ToWgs84Re.findFirstMatchIn(s).flatMap { m =>
      val p = m.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble)
      val v = p.padTo(7, 0.0)
      if (v.take(7).forall(_ == 0.0)) None
      else Some(Helmert(tx = -v(0), ty = -v(1), tz = -v(2),
        rxSec = -v(3), rySec = -v(4), rzSec = -v(5), sPpm = -v(6),
        aDst = a, fDst = f))
    }
  }

  private def parseWkt(s: String): Option[CrsTransform] = {
    val method = MethodRe.findFirstMatchIn(s).map(_.group(1)).getOrElse(return None)
    val (a, invF) = SpheroidRe.findFirstMatchIn(s)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble))
      .getOrElse((WGS84_A, 1 / WGS84_F))
    val axisUnit = UnitRe.findAllMatchIn(s).toSeq.lastOption
      .filterNot(_.group(1).toLowerCase.contains("degree"))
      .map(_.group(2).toDouble).getOrElse(1.0)
    val params = ParamRe.findAllMatchIn(s).map { m =>
      val name = normName(m.group(1))
      val raw = m.group(2).toDouble
      val v = (Option(m.group(3)).map(_.toUpperCase), Option(m.group(4)).map(_.toDouble)) match {
        case (Some("ANGLEUNIT"), Some(f))  => raw * f / DegToRad // to degrees
        case (Some("LENGTHUNIT"), Some(f)) => raw * f / axisUnit // to projected axis units
        case _                             => raw // WKT1: degrees / axis units already
      }
      name -> v
    }.toMap
    // non-Greenwich prime meridian (Ferro, Paris): longitude parameters are
    // relative to it; shift them onto the Greenwich hub the transforms use
    val pm = PrimeMRe.findFirstMatchIn(s).map(_.group(1).toDouble).getOrElse(0.0)
    val shifted = if (pm == 0.0) params
      else params.map { case (k, v) => k -> (if (Lon0Names.contains(k)) v + pm else v) }
    val proj = build(method, shifted, axisUnit, a, invF)
    // a declared TOWGS84 datum shift composes in front of the projection;
    // without one the datum step stays the documented null transformation
    toWgs84Helmert(s) match {
      case Some(h) => proj.map(p => DatumProjected(h, p))
      case None    => proj
    }
  }

  // -------------------------------------------------------------- PROJJSON

  private def parseProjJson(s: String): Option[CrsTransform] = {
    val root = scala.util.Try(
      graft.functions.GeoJson.parseJson(s).asInstanceOf[Map[String, Any]]).getOrElse(return None)
    parseProjJsonObj(root)
  }

  private def jobj(m: Map[String, Any], k: String): Option[Map[String, Any]] =
    m.get(k).collect { case o: Map[String @unchecked, Any @unchecked] => o }
  private def jnum(m: Map[String, Any], k: String): Option[Double] = m.get(k).collect {
    case d: Double => d
    case i: Int    => i.toDouble
    case l: Long   => l.toDouble
    case b: BigDecimal => b.toDouble
  }

  /** The ellipsoid of a (possibly nested) PROJJSON CRS object. */
  private def jsonEllipsoid(crs: Map[String, Any]): Option[Map[String, Any]] = {
    val geo = jobj(crs, "base_crs").getOrElse(crs)
    jobj(geo, "datum").orElse(jobj(geo, "datum_ensemble")).flatMap(jobj(_, "ellipsoid"))
  }

  /** PROJJSON BoundCRS: `source_crs` + an abridged/Helmert `transformation`
    * to the WGS84 hub. The transformation's 3/7 parameters (EPSG names,
    * honoring declared units: metre / arc-second / ppm objects) become this
    * engine's negated WGS84->target [[Helmert]]; Coordinate Frame rotation
    * convention is negated onto Position Vector. */
  private def boundCrsHelmert(root: Map[String, Any]): Option[Helmert] = {
    val tf = jobj(root, "transformation").getOrElse(return None)
    val methodName = jobj(tf, "method").flatMap(_.get("name").collect { case s: String => s })
      .map(normName).getOrElse("")
    val coordFrame = methodName.contains("coordinateframe")
    val src = jobj(root, "source_crs").getOrElse(return None)
    val ell = jsonEllipsoid(src)
    val a = ell.flatMap(jnum(_, "semi_major_axis")).getOrElse(WGS84_A)
    val invF = ell.flatMap(jnum(_, "inverse_flattening")).getOrElse(1 / WGS84_F)
    val f = if (invF.isInfinite || invF == 0) 0.0 else 1 / invF
    val vals = tf.get("parameters").collect { case l: Seq[Any @unchecked] => l }
      .getOrElse(Nil).flatMap {
        case p: Map[String @unchecked, Any @unchecked] =>
          for (n <- p.get("name").collect { case s: String => s }; v <- jnum(p, "value")) yield {
            // unit conversion: translations to metres, rotations to
            // arc-seconds, scale difference to ppm
            val cf = p.get("unit") match {
              case Some(o: Map[String @unchecked, Any @unchecked]) =>
                jnum(o, "conversion_factor").getOrElse(1.0)
              case Some("metre") | Some("meter") | None => 1.0
              case Some("arc-second") => 4.84813681109536e-6
              case Some("parts per million") => 1e-6
              case _ => 1.0
            }
            val name = normName(n)
            val adj =
              if (name.contains("rotation")) v * cf / 4.84813681109536e-6 // to arc-sec
              else if (name.contains("scale")) v * cf / 1e-6              // to ppm
              else v * cf                                                 // to metres
            name -> adj
          }
        case _ => None
      }.toMap
    def g(k: String): Double = vals.getOrElse(k, 0.0)
    val rSign = if (coordFrame) -1.0 else 1.0
    val (tx, ty, tz) = (g("xaxistranslation"), g("yaxistranslation"), g("zaxistranslation"))
    val (rx, ry, rz) = (rSign * g("xaxisrotation"), rSign * g("yaxisrotation"), rSign * g("zaxisrotation"))
    val sc = g("scaledifference")
    if (tx == 0 && ty == 0 && tz == 0 && rx == 0 && ry == 0 && rz == 0 && sc == 0) None
    else Some(Helmert(tx = -tx, ty = -ty, tz = -tz,
      rxSec = -rx, rySec = -ry, rzSec = -rz, sPpm = -sc, aDst = a, fDst = f))
  }

  private def parseProjJsonObj(root: Map[String, Any]): Option[CrsTransform] = {
    def obj(m: Map[String, Any], k: String): Option[Map[String, Any]] = jobj(m, k)
    def num(m: Map[String, Any], k: String): Option[Double] = jnum(m, k)
    val tpe = root.get("type").collect { case t: String => t }.getOrElse("")
    if (tpe == "GeographicCRS" || tpe == "GeodeticCRS") return Some(Identity)
    if (tpe == "BoundCRS") {
      val src = jobj(root, "source_crs").getOrElse(return None)
      val inner = parseProjJsonObj(src).getOrElse(return None)
      return Some(boundCrsHelmert(root).map(h => DatumProjected(h, inner): CrsTransform)
        .getOrElse(inner))
    }
    if (tpe == "CompoundCRS") {
      // horizontal + vertical: resolve the first resolvable horizontal member
      val comps = root.get("components").collect { case l: Seq[Any @unchecked] => l }.getOrElse(Nil)
      return comps.collectFirst {
        case c: Map[String @unchecked, Any @unchecked]
          if parseProjJsonObj(c).isDefined => parseProjJsonObj(c).get
      }
    }
    if (tpe != "ProjectedCRS") return None

    val ellipsoid = for {
      base  <- obj(root, "base_crs")
      datum <- obj(base, "datum").orElse(obj(base, "datum_ensemble"))
      ell   <- obj(datum, "ellipsoid")
    } yield ell
    val a = ellipsoid.flatMap(num(_, "semi_major_axis")).getOrElse(WGS84_A)
    val invF = ellipsoid.flatMap(num(_, "inverse_flattening")).getOrElse {
      // sphere (radius only) or b given
      val b = ellipsoid.flatMap(e => num(e, "semi_minor_axis").orElse(num(e, "radius")))
      b.map(bb => if (bb == a) Double.PositiveInfinity else a / (a - bb)).getOrElse(1 / WGS84_F)
    }

    val conv = obj(root, "conversion").getOrElse(return None)
    val method = obj(conv, "method").flatMap(_.get("name").collect { case n: String => n })
      .getOrElse(return None)

    // axis unit: "metre"/named unit object with conversion_factor
    def unitFactor(u: Any): Double = u match {
      case "metre" | "meter" => 1.0
      case "degree"          => Double.NaN // angular
      case s: String if s.contains("foot") => if (s.contains("US")) FtUs else 0.3048
      case o: Map[String @unchecked, Any @unchecked] =>
        num(o, "conversion_factor").getOrElse(1.0)
      case _ => 1.0
    }
    val axisUnit = (for {
      cs   <- obj(root, "coordinate_system")
      axes <- cs.get("axis").collect { case l: Seq[Any @unchecked] => l }
      ax0  <- axes.headOption.collect { case o: Map[String @unchecked, Any @unchecked] => o }
      u    <- ax0.get("unit")
    } yield unitFactor(u)).filterNot(_.isNaN).getOrElse(1.0)

    val params = conv.get("parameters").collect { case l: Seq[Any @unchecked] => l }
      .getOrElse(Nil).flatMap {
        case p: Map[String @unchecked, Any @unchecked] =>
          for {
            n <- p.get("name").collect { case s: String => s }
            v <- num(p, "value")
          } yield {
            val u = p.get("unit").map(unitFactor).getOrElse(1.0)
            val vAdj = p.get("unit") match {
              case Some("degree")                     => v
              case Some(o: Map[_, _])                 =>
                val f = unitFactor(o)
                val isAngular = o.asInstanceOf[Map[String, Any]].get("type")
                  .contains("AngularUnit")
                if (isAngular) v * f / DegToRad else v * f / axisUnit
              case Some("metre") | Some("meter")      => v / axisUnit
              case _ if u != 1.0                      => v * u / axisUnit
              case _                                  => v
            }
            normName(n) -> vAdj
          }
        case _ => None
      }.toMap
    build(method, params, axisUnit, a, invF)
  }

  // ----------------------------------------------------------------- build

  private def normName(n: String): String = n.toLowerCase.replaceAll("[^a-z0-9]", "")

  private val Lat0Names = Seq("latitudeoforigin", "latitudeoffalseorigin",
    "latitudeofnaturalorigin", "latitudeofcenter", "latitudeofprojectioncentre")
  private val Lon0Names = Seq("centralmeridian", "longitudeoffalseorigin",
    "longitudeofnaturalorigin", "longitudeofcenter", "longitudeofprojectioncentre", "longitudeoforigin")
  private val Sp1Names = Seq("standardparallel1", "latitudeof1ststandardparallel",
    "standardparallel", "latitudeofstandardparallel")
  private val Sp2Names = Seq("standardparallel2", "latitudeof2ndstandardparallel")
  private val K0Names = Seq("scalefactor", "scalefactoratnaturalorigin",
    "scalefactoroninitialline", "scalefactoratprojectioncentre")
  private val FeNames = Seq("falseeasting", "eastingatfalseorigin", "eastingatprojectioncentre")
  private val FnNames = Seq("falsenorthing", "northingatfalseorigin", "northingatprojectioncentre")

  private def build(method: String, params: Map[String, Double], unit: Double,
                    a: Double, invF: Double): Option[CrsTransform] = {
    def get(names: Seq[String]): Option[Double] = names.flatMap(params.get).headOption
    def or0(names: Seq[String]): Double = get(names).getOrElse(0.0)
    val f = if (invF.isInfinite || invF == 0) 0.0 else 1 / invF
    val m = normName(method)
    val lat0 = or0(Lat0Names); val lon0 = or0(Lon0Names)
    val fe = or0(FeNames); val fn = or0(FnNames)
    val k0 = get(K0Names).getOrElse(1.0)
    val sp1 = get(Sp1Names); val sp2 = get(Sp2Names)

    if (m.contains("transversemercator") || m.contains("gausskruger"))
      Some(Tm(lat0, lon0, k0, fe, fn, unit, a, f))
    else if (m.contains("obliquestereographic") || m.contains("doublestereographic") ||
             m.contains("roussilhe"))
      Some(ObliqueStereo(lat0, lon0, k0, fe, fn, unit, a, f))
    else if (m.contains("azimuthalequalarea"))
      Some(Laea(lat0, lon0, fe, fn, unit, a, f))
    else if (m.contains("cylindricalequalarea"))
      Some(CylEqualArea(sp1.getOrElse(lat0), lon0, fe, fn, unit, a, f))
    else if (m.contains("polarstereographic") ||
             m.contains("stereographicnorthpole") || m.contains("stereographicsouthpole")) {
      // variant B keys on the standard parallel (EPSG 9829, ESRI
      // Stereographic_North/South_Pole); variant A (EPSG 9810) is the
      // natural-origin-at-the-pole form, wired only for its UPS shape
      // (central meridian 0, metre axes) — anything else stays unsupported
      // rather than silently wrong
      sp1 match {
        case Some(p) => Some(PolarStereoB(p, lon0, fe, fn, unit, a, f))
        case None if math.abs(math.abs(lat0) - 90) < 1e-9 && lon0 == 0.0 && unit == 1.0 =>
          Some(PolarStereoA(lat0 > 0, k0, fe, fn, a, f))
        case None => None
      }
    }
    else if (m.contains("equalearth") && unit == 1.0)
      Some(EqualEarth(lon0, fe, fn, a, f))
    else if (m.contains("mollweide") && unit == 1.0)
      Some(Mollweide(lon0, fe, fn, a))
    else if (m.contains("lambertconformalconic") || m.contains("lambertconicconformal")) {
      val s1 = sp1.getOrElse(lat0)
      val s2 = sp2.getOrElse(s1)
      Some(Lcc2Sp(lat0, lon0, s1, s2, fe, fn, unit, f, a, k0))
    } else if (m.contains("albers"))
      Some(Albers2Sp(lat0, lon0, sp1.getOrElse(lat0), sp2.getOrElse(sp1.getOrElse(lat0)),
        fe, fn, f, a, unit))
    else if ((m.contains("obliquemercator") || m.contains("rectifiedskeworthomorphic") ||
              m.contains("swissobliquecylindrical")) && !m.contains("laborde")) {
      // Hotine Oblique Mercator: EPSG variants A (9812) and B (9815), the
      // ESRI Azimuth_Natural_Origin / Azimuth_Center spellings, RSO, and
      // the Swiss Oblique Cylindrical alias (9814 = variant B, alpha 90)
      val alphaC = get(Seq("azimuth", "azimuthofinitialline",
        "azimuthatprojectioncentre")).getOrElse(90.0)
      val gammaC = get(Seq("anglefromrectifiedtoskewgrid", "rectifiedgridangle",
        "xyplanerotation")).getOrElse(alphaC)
      val variantB = m.contains("variantb") || m.contains("center") ||
        m.contains("centre") || m.contains("swiss") ||
        params.contains("eastingatprojectioncentre")
      Some(HotineOM(lat0, lon0, alphaC, gammaC, k0, fe, fn, variantB, unit, a, f))
    }
    else if (m.contains("twopointequidistant")) {
      // ESRI 54031 World_Two_Point_Equidistant; spherical (Snyder 192-195)
      val la1 = get(Seq("latitudeof1stpoint", "latitudeoffirstpoint", "lat1"))
      val lo1 = get(Seq("longitudeof1stpoint", "longitudeoffirstpoint", "lon1"))
      val la2 = get(Seq("latitudeof2ndpoint", "latitudeofsecondpoint", "lat2"))
      val lo2 = get(Seq("longitudeof2ndpoint", "longitudeofsecondpoint", "lon2"))
      for (p1 <- la1; q1 <- lo1; p2 <- la2; q2 <- lo2)
        yield TwoPointEquidistant(p1, q1, p2, q2, fe, fn, unit, a)
    }
    else if (m.contains("laborde")) {
      // Laborde Oblique Mercator (EPSG 9813, Madagascar): GN7-2 formulas,
      // validated against the guidance-note worked example in ProjParseSpec
      // loud-raise, no silent Madagascar default (r20 advice): an azimuth
      // is not reconstructible — a definition without one would be
      // mislabeled, not approximated
      val az = get(Seq("azimuth", "azimuthofinitialline",
        "azimuthatprojectioncentre")).getOrElse(throw new IllegalArgumentException(
        "Laborde (EPSG 9813) definition carries no azimuth parameter " +
          "(looked for azimuth / azimuth_of_initial_line / " +
          "azimuth_at_projection_centre) — refusing to assume one"))
      Some(LabordeOM(lat0, lon0, az, k0, fe, fn, unit, a, f))
    }
    else if (m.contains("newzealandmapgrid")) {
      // NZMG (EPSG 9811): the defining complex-polynomial coefficients fix
      // the origin at 41S 173E on International 1924 — a WKT claiming any
      // other origin/ellipsoid is not NZMG, so raise rather than mislabel
      require(math.abs(lat0 + 41.0) < 1e-9 && math.abs(lon0 - 173.0) < 1e-9,
        s"New Zealand Map Grid is DEFINED at origin 41S 173E (got $lat0, $lon0); " +
          "its minimum-scale-error polynomial has no free origin parameters")
      require(math.abs(a - CrsTransform.INTL_A) < 0.5,
        s"New Zealand Map Grid is defined on International 1924 (a=6378388), got a=$a")
      Some(Nzmg(fe, fn, unit))
    }
    else if (m.contains("azimuthalequidistant") && !m.contains("modified"))
      // spherical form on R = a (the ESRI 54032 / +proj=aeqd sphere shape);
      // EPSG 9832 "Modified Azimuthal Equidistant" is ellipsoidal — raise
      Some(AzimuthalEquidistant(lat0, lon0, fe, fn, unit, a))
    else if (m.contains("cassini"))
      Some(Cassini(lat0, lon0, fe, fn, unit, a, f))
    else if (m.contains("polyconic") && !m.contains("rectangular"))
      Some(Polyconic(lat0, lon0, fe, fn, unit, a, f))
    else if (m.contains("equidistantcylindrical") || m.contains("equirectangular") ||
             m.contains("platecarree"))
      Some(EquidistantCyl(sp1.getOrElse(lat0), 0.0, lon0, fe, fn, unit, a, f))
    else if (m.contains("krovak")) {
      val alphaC = get(Seq("colatitudeofconeaxis", "azimuth"))
        .getOrElse(30.0 + 17.0 / 60 + 17.3031 / 3600)
      val latP1 = get(Seq("latitudeofpseudostandardparallel", "pseudostandardparallel1"))
        .getOrElse(78.5)
      val kP = get(Seq("scalefactoronpseudostandardparallel") ++ K0Names).getOrElse(0.9999)
      // EPSG method 1041 is named "Krovak (East North)"; ESRI encodes the
      // same orientation as X_Scale = Y_Scale = -1 + XY_Plane_Rotation 90
      val eastNorth = m.contains("eastnorth") ||
        (params.get("xscale").contains(-1.0) && params.get("yscale").contains(-1.0))
      Some(Krovak(lat0, lon0, alphaC, latP1, kP, fe, fn, eastNorth, unit, a, f))
    }
    else if (m.contains("pseudomercator") || m.contains("mercatorauxiliarysphere"))
      Some(PseudoMerc(lon0, fe, fn, unit, a))
    else if (m.contains("sinusoidal"))
      Some(Sinusoidal(lon0, fe, fn, a, f, unit))
    else if (m.contains("eckertiv") || m.contains("eckert4"))
      Some(EckertIv(lon0, fe, fn, a, unit))
    else if (m.contains("mercator") && !m.contains("oblique")) {
      // variant B / 2SP: k0 derived from the standard parallel (EPSG 9805)
      val e2 = f * (2 - f)
      val kEff = sp1.map { p =>
        val phi = math.toRadians(p)
        math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      }.getOrElse(k0)
      Some(Merc1Sp(lon0, kEff, fe, fn, unit, a, f))
    } else None
  }
}
