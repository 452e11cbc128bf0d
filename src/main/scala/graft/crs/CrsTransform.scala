package graft.crs

/** Coordinate reference system transforms, hand-implemented (no PROJ on the
  * JVM offline; reference uses pyproj `array.py:1098-1187`). Pluggable via
  * [[CrsTransform]]; supported family covers every CRS in the reference's
  * tests/benchmarks: EPSG:4326 (lon/lat WGS84), EPSG:3857 (web mercator),
  * EPSG:3395 (world mercator, ellipsoidal), EPSG:326xx/327xx (UTM).
  *
  * Formulas are the standard published ones (Snyder, "Map Projections — A
  * Working Manual", USGS 1987; OGP Guidance Note 7-2).
  */
trait CrsTransform extends Serializable {
  /** (x, y) -> (x', y'). Input/output axis order is always (east-ish, north-ish). */
  def forward(x: Double, y: Double): (Double, Double)
  def inverse(x: Double, y: Double): (Double, Double)
}

object CrsTransform {
  val WGS84_A = 6378137.0
  val WGS84_F = 1.0 / 298.257223563
  val WGS84_E2 = WGS84_F * (2 - WGS84_F)
  val WGS84_E = math.sqrt(WGS84_E2)

  /** Authalic q of Snyder eq. 3-12, shared by the equal-area projections
    * (Albers 14-x, cylindrical equal-area 10-x, LAEA 24-x). */
  private[crs] def authalicQ(phi: Double, e: Double, e2: Double): Double = {
    val s = math.sin(phi)
    (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
  }

  /** Recover φ from the authalic q (Snyder eq. 3-16/3-18). The Newton
    * correction is ∝ (1−e²sin²φ)²/(2cosφ) · Δq, which degenerates at the
    * pole (cos φ → 0 on the double root — a fixed iteration from the
    * spherical seed stalls ~13 m short of ±90°, round-16 advice), so:
    *
    *  - |q| within one q-resolution step of q(π/2) maps straight to ±π/2
    *    (Snyder's convention; near the pole q ≈ q(π/2) − k·cos²φ, so
    *    double precision cannot resolve φ closer than ~0.5 m anyway);
    *  - the seed is the authalic-latitude SERIES (Snyder eq. 3-18), exact
    *    at the pole and ~1e-10 rad everywhere, so Newton starts inside its
    *    convergence basin;
    *  - Newton then polishes to 1e-13 rad (≤3 rounds in practice, 15-round
    *    safety cap), skipped in the last ~1e-8 rad where the series value
    *    is already past double-precision q-resolution. */
  private[crs] def phiFromQ(qq: Double, e: Double, e2: Double): Double = {
    val qp = authalicQ(math.Pi / 2, e, e2)
    if (qp - math.abs(qq) < 1e-14) return if (qq < 0) -math.Pi / 2 else math.Pi / 2
    val beta = math.asin(math.min(1, math.max(-1, qq / qp)))
    val e4 = e2 * e2
    val e6 = e4 * e2
    var phi = beta +
      (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * math.sin(2 * beta) +
      (23 * e4 / 360 + 251 * e6 / 3780) * math.sin(4 * beta) +
      (761 * e6 / 45360) * math.sin(6 * beta)
    var corr = 1.0
    var i = 0
    while (i < 15 && math.abs(corr) > 1e-13 && math.cos(phi) > 1e-8) {
      val s = math.sin(phi)
      corr = math.pow(1 - e2 * s * s, 2) / (2 * math.cos(phi)) *
        (qq / (1 - e2) - s / (1 - e2 * s * s) + (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
      phi += corr
      i += 1
    }
    phi
  }

  /** Normalize a CRS name: accepts "EPSG:4326", "epsg:4326", "4326",
    * "OGC:CRS84", and "ESRI:54009" (ESRI codes live in a disjoint number
    * range, so the bare int is unambiguous in the registry). */
  def normalize(crs: String): Int = {
    val c = crs.trim.toUpperCase
    if (c == "OGC:CRS84" || c == "CRS84") 4326
    else if (c.startsWith("EPSG:")) c.substring(5).toInt
    else if (c.startsWith("ESRI:")) c.substring(5).toInt
    else c.toInt
  }

  /** Tolerant variant of [[normalize]]: CRS read from the wild (e.g. a .prj
    * WKT stored verbatim by the Shapefile reader) is a normal state, not an
    * error. WKT1/WKT2 strings carry their EPSG code in a trailing
    * AUTHORITY/ID clause — recover it when present, otherwise None. */
  def normalizeOpt(crs: String): Option[Int] = {
    scala.util.Try(normalize(crs)).toOption.orElse {
      // last AUTHORITY["EPSG","4326"] (WKT1) or ID["EPSG",4326] (WKT2) wins:
      // earlier clauses belong to nested datum/spheroid definitions.
      val auth = """(?i)(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]""".r
      auth.findAllMatchIn(crs).toSeq.lastOption.map(_.group(1).toInt)
    }.orElse(esriNameEpsg(crs))
  }

  /** ESRI-dialect .prj files carry no AUTHORITY clause — recognize the
    * well-known coordinate-system NAMES of the engine's allowlist (the
    * reference gets this resolution from pyproj/PROJ's identify). */
  private def esriNameEpsg(crs: String): Option[Int] = {
    val name = """^\s*(?:GEOGCS|PROJCS|GEOGCRS|PROJCRS)\s*\[\s*"([^"]+)"""".r
      .findFirstMatchIn(crs).map(_.group(1)).getOrElse(return None)
    val n = name.toUpperCase.replace(' ', '_')
    n match {
      case "GCS_WGS_1984" | "WGS_84" | "WGS_1984"                        => Some(4326)
      case "GCS_NORTH_AMERICAN_1983" | "NAD83"                           => Some(4269)
      case "GCS_NORTH_AMERICAN_1927" | "NAD27"                           => Some(4267)
      case "WGS_1984_WEB_MERCATOR_AUXILIARY_SPHERE"                      => Some(3857)
      case "WORLD_MERCATOR" | "WGS_1984_WORLD_MERCATOR"                  => Some(3395)
      case "NAD_1983_STATEPLANE_NEW_YORK_LONG_ISLAND_FIPS_3104_FEET"     => Some(2263)
      case "NAD_1983_CONTIGUOUS_USA_ALBERS" | "USA_CONTIGUOUS_ALBERS_EQUAL_AREA_CONIC_USGS_VERSION" => Some(5070)
      case _ =>
        """^WGS_1984_UTM_ZONE_(\d{1,2})([NS])$""".r.findFirstMatchIn(n).map { m =>
          val z = m.group(1).toInt
          if (m.group(2) == "N") 32600 + z else 32700 + z
        }.orElse {
          """^NAD_1983_UTM_ZONE_(\d{1,2})N$""".r.findFirstMatchIn(n).map(m => 26900 + m.group(1).toInt)
        }
    }
  }

  /** Whether a CRS string denotes a geographic (angular-unit) CRS. Keys off
    * the engine's known geographic EPSG codes, falling back to the WKT
    * keyword for unparseable strings (ref pyproj CRS.is_geographic used at
    * array.py:435-446). */
  def isGeographic(crs: String): Boolean =
    normalizeOpt(crs) match {
      case Some(code) => GeographicEpsg.contains(code)
      case None       => crs.trim.toUpperCase.matches("^(GEOGCS|GEOGCRS|GEODCRS)\\b.*")
    }

  /** Geographic (angular-unit) EPSG codes within the engine's allowlist. */
  val GeographicEpsg: Set[Int] = Set(4326, 4269, 4267)

  /** Identity transform. */
  object Identity extends CrsTransform {
    def forward(x: Double, y: Double): (Double, Double) = (x, y)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** EPSG:4326 -> EPSG:3857 spherical (web) mercator. */
  object WebMercator extends CrsTransform {
    private val R = WGS84_A
    def forward(lon: Double, lat: Double): (Double, Double) =
      (R * math.toRadians(lon), R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(x / R), math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2))
  }

  /** EPSG:4326 -> EPSG:3395 ellipsoidal mercator. */
  object WorldMercator extends CrsTransform {
    private val a = WGS84_A
    private val e = WGS84_E
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val esin = e * math.sin(phi)
      val y = a * math.log(math.tan(math.Pi / 4 + phi / 2) * math.pow((1 - esin) / (1 + esin), e / 2))
      (a * math.toRadians(lon), y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-y / a)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 15 } else { phi = next }
        i += 1
      }
      (math.toDegrees(x / a), math.toDegrees(phi))
    }
  }

  /** General Transverse Mercator (Snyder 1987 eq. 8-9..8-17, series form;
    * ~mm accuracy within a UTM-width band of the central meridian). `unit`
    * scales the projected axes (1.0 = meters, FtUs = ftUS); false
    * easting/northing are given in projected units, per WKT convention. */
  final case class Tm(lat0: Double, lonCm: Double, k0: Double,
                      fe: Double, fn: Double, unit: Double = 1.0,
                      a: Double = WGS84_A, flattening: Double = WGS84_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val ep2 = e2 / (1 - e2)
    private val lon0 = math.toRadians(lonCm)

    private def meridianArc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    private val m0 = meridianArc(math.toRadians(lat0))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val n = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ep2 * cosP * cosP
      val aa = cosP * (lam - lon0)
      val m = meridianArc(phi)
      val x = k0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120)
      val y = k0 * (m - m0 + n * tanP * (aa * aa / 2 + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
        + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720))
      (x / unit + fe, y / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val m = m0 + (y - fn) * unit / k0
      val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val c1 = ep2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = a / math.sqrt(1 - e2 * sinP * sinP)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
      val d = (x - fe) * unit / (n1 * k0)
      val lat = phi1 - (n1 * tanP / r1) * (d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
      val lon = lon0 + (d - (1 + 2 * t1 + c1) * d * d * d / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cosP
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** EPSG:4326 -> UTM zone: the k0=0.9996 / FE=500km special case of [[Tm]]. */
  final case class Utm(zone: Int, north: Boolean) extends CrsTransform {
    private val tm = Tm(lat0 = 0.0, lonCm = -183.0 + 6.0 * zone, k0 = 0.9996,
      fe = 500000.0, fn = if (north) 0.0 else 10000000.0)
    def forward(lon: Double, lat: Double): (Double, Double) = tm.forward(lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = tm.inverse(x, y)
  }

  /** GRS80 (NAD83) flattening; datum shift vs WGS84 is centimetric and
    * ignored, like the 269xx UTM handling above. */
  val GRS80_F = 1.0 / 298.257222101
  /** US survey foot in meters (EPSG:9003). */
  val FtUs = 1200.0 / 3937.0

  /** Lambert Conformal Conic, ellipsoidal (Snyder 1987 eq. 15-1..15-11;
    * the state-plane workhorse — EPSG:2263 is the reference's nybb fixture
    * CRS). `unit` scales the projected axes (1.0 = meters, FtUs = ftUS);
    * false origin is given in projected units. `sp1 == sp2` (or `k0 != 1`)
    * gives the 1SP variant, where the cone constant is sin(sp1) and k0
    * scales the radius (EPSG method 9801). */
  final case class Lcc2Sp(lat0: Double, lon0: Double, sp1: Double, sp2: Double,
                          fe: Double, fn: Double, unit: Double = 1.0,
                          flattening: Double = GRS80_F, a: Double = WGS84_A,
                          k0: Double = 1.0) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private def m(phi: Double) = math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private def t(phi: Double) = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), e / 2)
    }
    private val p1 = math.toRadians(sp1)
    private val p2 = math.toRadians(sp2)
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val n =
      if (math.abs(sp1 - sp2) < 1e-10) math.sin(p1)
      else (math.log(m(p1)) - math.log(m(p2))) / (math.log(t(p1)) - math.log(t(p2)))
    private val bigF = k0 * m(p1) / (n * math.pow(t(p1), n))
    private val rho0 = a * bigF * math.pow(t(p0), n)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val rho = a * bigF * math.pow(t(phi), n)
      val theta = n * (math.toRadians(lon) - l0)
      val xm = rho * math.sin(theta)
      val ym = rho0 - rho * math.cos(theta)
      (xm / unit + fe, ym / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xm = (x - fe) * unit
      val ym = (y - fn) * unit
      val rho = math.signum(n) * math.hypot(xm, rho0 - ym)
      val theta = math.atan2(xm, rho0 - ym)
      val tp = math.pow(rho / (a * bigF), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(tp)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(tp * math.pow((1 - esin) / (1 + esin), e / 2))
        i += 1
      }
      (math.toDegrees(theta / n + l0), math.toDegrees(phi))
    }
  }

  /** Albers Equal Area, ellipsoidal (Snyder eq. 14-1..14-21) —
    * EPSG:5070 is CONUS Albers. `sp1 == sp2` gives the 1SP cone. */
  final case class Albers2Sp(lat0: Double, lon0: Double, sp1: Double, sp2: Double,
                             fe: Double, fn: Double,
                             flattening: Double = GRS80_F, a: Double = WGS84_A,
                             unit: Double = 1.0) extends CrsTransform {
    private val e2 = math.max(flattening * (2 - flattening), 1e-20) // sphere-safe q()
    private val e = math.sqrt(e2)
    private def m(phi: Double) = math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private def q(phi: Double) = authalicQ(phi, e, e2)
    private val p1 = math.toRadians(sp1)
    private val p2 = math.toRadians(sp2)
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val n =
      if (math.abs(sp1 - sp2) < 1e-10) math.sin(p1)
      else (m(p1) * m(p1) - m(p2) * m(p2)) / (q(p2) - q(p1))
    private val c = m(p1) * m(p1) + n * q(p1)
    private val rho0 = a * math.sqrt(c - n * q(p0)) / n

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val rho = a * math.sqrt(c - n * q(phi)) / n
      val theta = n * (math.toRadians(lon) - l0)
      (rho * math.sin(theta) / unit + fe, (rho0 - rho * math.cos(theta)) / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xm = (x - fe) * unit
      val ym = (y - fn) * unit
      val rho = math.hypot(xm, rho0 - ym)
      val theta = math.atan2(xm * math.signum(n), (rho0 - ym) * math.signum(n))
      val qq = (c - rho * rho * n * n / (a * a)) / n
      val phi = phiFromQ(qq, e, e2)
      (math.toDegrees(theta / n + l0), math.toDegrees(phi))
    }
  }

  /** Polar Stereographic, EPSG method 9829 (variant B — standard parallel
    * `latTs`, scale 1 on that ring): EPSG:3413 (NSIDC Sea Ice Polar
    * Stereographic North, the Arctic data CRS) and EPSG:3031/3976 (Antarctic
    * Polar Stereographic — the Antarctic data CRS). Snyder eq. 21-33..21-41
    * ellipsoidal form; the south aspect is the north core under the
    * (φ, λ, E, N) → (−φ, −λ, −E, −N) mirror, which is exactly the EPSG
    * south-pole variant. Inverse iterates φ from the isometric t (same
    * fixed-point as [[Lcc2Sp]], sub-mm in ≤15 rounds). */
  final case class PolarStereoB(latTs: Double, lon0: Double,
                                fe: Double, fn: Double, unit: Double = 1.0,
                                a: Double = WGS84_A, flattening: Double = WGS84_F)
      extends CrsTransform {
    private val south = latTs < 0
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private def tN(phi: Double) = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) * math.pow((1 + esin) / (1 - esin), e / 2)
    }
    private def m(phi: Double) = math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val pts = math.toRadians(math.abs(latTs))
    private val l0 = math.toRadians(if (south) -lon0 else lon0)
    private val rhoF = a * m(pts) / tN(pts) // rho = rhoF * t(phi)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val s = if (south) -1.0 else 1.0
      val phi = math.toRadians(lat * s)
      val lam = math.toRadians(lon * s)
      val rho = rhoF * tN(phi)
      val xm = s * rho * math.sin(lam - l0)
      val ym = s * -rho * math.cos(lam - l0)
      (xm / unit + fe, ym / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val s = if (south) -1.0 else 1.0
      val xm = (x - fe) * unit * s
      val ym = (y - fn) * unit * s
      val rho = math.hypot(xm, ym)
      val tp = rho / rhoF
      var phi = math.Pi / 2 - 2 * math.atan(tp)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(tp * math.pow((1 - esin) / (1 + esin), e / 2))
        i += 1
      }
      val lam = if (rho == 0) l0 else l0 + math.atan2(xm, -ym)
      (math.toDegrees(lam) * s, math.toDegrees(phi) * s)
    }
  }

  /** Polar Stereographic variant A (EPSG method 9810: scale factor k0 AT
    * the pole, central meridian 0) — the UPS grids EPSG:32661 (North) /
    * 32761 (South), k0 = 0.994, FE = FN = 2 000 000 m. Same conformal
    * t-function machinery as [[PolarStereoB]]; only the rho scale differs:
    * rho = 2·a·k0·t / sqrt((1+e)^(1+e)·(1−e)^(1−e)). */
  final case class PolarStereoA(north: Boolean, k0: Double,
                                fe: Double, fn: Double,
                                a: Double = WGS84_A, flattening: Double = WGS84_F)
      extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private def tN(phi: Double) = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) * math.pow((1 + esin) / (1 - esin), e / 2)
    }
    private val rhoF = 2 * a * k0 /
      math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val s = if (north) 1.0 else -1.0
      val phi = math.toRadians(lat * s)
      val lam = math.toRadians(lon * s)
      val rho = rhoF * tN(phi)
      (s * rho * math.sin(lam) + fe, s * -rho * math.cos(lam) + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val s = if (north) 1.0 else -1.0
      val xm = (x - fe) * s
      val ym = (y - fn) * s
      val rho = math.hypot(xm, ym)
      val tp = rho / rhoF
      var phi = math.Pi / 2 - 2 * math.atan(tp)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(tp * math.pow((1 - esin) / (1 + esin), e / 2))
        i += 1
      }
      val lam = if (rho == 0) 0.0 else math.atan2(xm, -ym)
      (math.toDegrees(lam) * s, math.toDegrees(phi) * s)
    }
  }

  /** Lambert Cylindrical Equal Area, ellipsoidal (EPSG method 9835) —
    * EPSG:6933 is EASE-Grid 2.0 Global (latTs 30, the earth-science
    * swath-data grid). Snyder eq. 10-1/10-2 with the authalic q of
    * [[Albers2Sp]]; inverse refines φ from q with the same correction
    * iteration Albers uses. */
  final case class CylEqualArea(latTs: Double, lon0: Double,
                                fe: Double, fn: Double, unit: Double = 1.0,
                                a: Double = WGS84_A, flattening: Double = WGS84_F)
      extends CrsTransform {
    private val e2 = math.max(flattening * (2 - flattening), 1e-20)
    private val e = math.sqrt(e2)
    private def q(phi: Double) = authalicQ(phi, e, e2)
    private val pts = math.toRadians(latTs)
    private val l0 = math.toRadians(lon0)
    private val k0 = math.cos(pts) / math.sqrt(1 - e2 * math.sin(pts) * math.sin(pts))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val xm = a * k0 * (math.toRadians(lon) - l0)
      val ym = a * q(phi) / (2 * k0)
      (xm / unit + fe, ym / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val qq = 2 * k0 * (y - fn) * unit / a
      val phi = phiFromQ(qq, e, e2)
      (math.toDegrees((x - fe) * unit / (a * k0) + l0), math.toDegrees(phi))
    }
  }

  /** Equal Earth (EPSG method 1078; Šavrič, Patterson & Jenny 2018 —
    * published polynomial, coefficients A1..A4 from the paper). EPSG:8857
    * is WGS 84 / Equal Earth Greenwich, the equal-area world map CRS.
    * Ellipsoidal form: authalic latitude β (via the shared q of
    * [[authalicQ]]), spherical Equal Earth on the authalic radius
    * Rq = a·√(q(π/2)/2); the equal-area property holds by construction
    * (x is the area-preserving reciprocal of dy/dθ), and the parametric
    * latitude is bounded (θ(±90°) = ±π/3, cos θ ≥ ½) so nothing
    * degenerates at the poles except the recovery of φ from q, which
    * [[phiFromQ]] already pole-cases. */
  final case class EqualEarth(lon0: Double = 0.0, fe: Double = 0.0, fn: Double = 0.0,
                              a: Double = WGS84_A, flattening: Double = WGS84_F)
      extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private val qp = authalicQ(math.Pi / 2, e, e2)
    private val rq = a * math.sqrt(qp / 2)
    private val l0 = math.toRadians(lon0)
    private val M = math.sqrt(3.0) / 2
    private val (a1, a2, a3, a4) = (1.340264, -0.081106, 0.000893, 0.003796)
    private def py(t: Double) = t * (a1 + a2 * t * t + math.pow(t, 6) * (a3 + a4 * t * t))
    private def dy(t: Double) = a1 + 3 * a2 * t * t + math.pow(t, 6) * (7 * a3 + 9 * a4 * t * t)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val beta = math.asin(math.min(1, math.max(-1,
        authalicQ(math.toRadians(lat), e, e2) / qp)))
      val t = math.asin(M * math.sin(beta))
      val x = 2 * math.sqrt(3.0) * rq * (math.toRadians(lon) - l0) * math.cos(t) / (3 * dy(t))
      (x + fe, rq * py(t) + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val yr = (y - fn) / rq
      // Newton for py(θ) = y/Rq: dy ≥ ~1.13 over the valid θ ∈ [−π/3, π/3],
      // so the step never degenerates; 1e-13 in ≤5 rounds
      var t = yr / a1
      var i = 0
      var corr = 1.0
      while (i < 25 && math.abs(corr) > 1e-13) {
        corr = (py(t) - yr) / dy(t)
        t -= corr
        i += 1
      }
      val beta = math.asin(math.min(1, math.max(-1, math.sin(t) / M)))
      val phi = phiFromQ(qp * math.sin(beta), e, e2)
      val lam = l0 + (x - fe) * 3 * dy(t) / (2 * math.sqrt(3.0) * rq * math.cos(t))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Mollweide, spherical (Snyder eq. 31-1..31-8) on the semimajor-axis
    * sphere — the GIS-standard "World Mollweide" (ESRI:54009 treats WGS 84
    * lon/lat as spherical, R = a). Equal-area by construction; the Newton
    * step for the parametric angle degenerates at the poles (2+2cos2θ → 0
    * on the double root — same shape as the authalic pole, round-16
    * advice), so |φ| at the pole maps directly to θ = ±π/2. */
  final case class Mollweide(lon0: Double = 0.0, fe: Double = 0.0, fn: Double = 0.0,
                             r: Double = WGS84_A) extends CrsTransform {
    private val l0 = math.toRadians(lon0)
    private val sq2 = math.sqrt(2.0)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val c = math.Pi * math.sin(phi)
      // near the pole 2θ+sin2θ ≈ π − (4/3)u³ (u = π/2−θ): the root is
      // cubic-degenerate and Newton from the φ seed crawls (linear 2/3
      // factor, ~36 rounds at 89.9999°) — seed with the closed-form
      // cube root there so the iteration starts next to the root
      var t =
        if (math.Pi - math.abs(c) < 1e-4)
          math.signum(phi) * (math.Pi / 2 - math.cbrt(3 * (math.Pi - math.abs(c)) / 4))
        else phi
      if (math.Pi / 2 - math.abs(phi) < 1e-10) t = math.signum(phi) * math.Pi / 2
      else {
        var i = 0
        var corr = 1.0
        while (i < 50 && math.abs(corr) > 1e-13) {
          corr = (2 * t + math.sin(2 * t) - c) / (2 + 2 * math.cos(2 * t))
          t -= corr
          i += 1
        }
      }
      val x = 2 * sq2 / math.Pi * r * (math.toRadians(lon) - l0) * math.cos(t)
      (x + fe, sq2 * r * math.sin(t) + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.asin(math.min(1, math.max(-1, (y - fn) / (sq2 * r))))
      val phi = math.asin(math.min(1, math.max(-1, (2 * t + math.sin(2 * t)) / math.Pi)))
      val lam =
        if (math.cos(t) < 1e-12) l0
        else l0 + math.Pi * (x - fe) / (2 * sq2 * r * math.cos(t))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Sinusoidal (Sanson–Flamsteed), ellipsoidal (Snyder eq. 30-8/30-9:
    * x = a·Δλ·cosφ/√(1−e²sin²φ), y = meridian arc M(φ)) — equal-area by
    * construction. `flattening = 0` gives the spherical case: the MODIS
    * land grid is Sinusoidal on the authalic sphere R = 6371007.181.
    * ESRI:54008 "World Sinusoidal" is the WGS 84 ellipsoidal form. The
    * inverse recovers φ from M by Newton (dM/dφ = a(1−e²)/W³ — strictly
    * positive, no degenerate root anywhere including the poles). */
  final case class Sinusoidal(lon0: Double = 0.0, fe: Double = 0.0, fn: Double = 0.0,
                              a: Double = WGS84_A, flattening: Double = WGS84_F,
                              unit: Double = 1.0)
      extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val l0 = math.toRadians(lon0)
    private def meridianArc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val sinP = math.sin(phi)
      val x = a * (math.toRadians(lon) - l0) * math.cos(phi) / math.sqrt(1 - e2 * sinP * sinP)
      (x / unit + fe, meridianArc(phi) / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = (y - fn) * unit
      var phi = m / a // spherical seed; exact when e2 = 0
      if (e2 > 0) {
        var i = 0
        var corr = 1.0
        while (i < 15 && math.abs(corr) > 1e-13) {
          val sinP = math.sin(phi)
          val w2 = 1 - e2 * sinP * sinP
          corr = (meridianArc(phi) - m) / (a * (1 - e2) / (w2 * math.sqrt(w2)))
          phi -= corr
          i += 1
        }
      }
      val cosP = math.cos(phi)
      val lam =
        if (math.abs(cosP) < 1e-12) l0
        else {
          val sinP = math.sin(phi)
          l0 + (x - fe) * unit * math.sqrt(1 - e2 * sinP * sinP) / (a * cosP)
        }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Eckert IV, spherical on R = a (Snyder eq. 32-1..32-10) — ESRI:54012
    * "World Eckert IV", the equal-area pseudocylindrical with elliptical
    * meridians. θ solves θ + sinθ·cosθ + 2sinθ = (2 + π/2)·sinφ; the
    * Newton derivative 2cosθ(1+cosθ) is quadratically degenerate at the
    * poles (the Mollweide shape), so |φ| = 90° maps directly and the
    * near-pole seed is the closed-form √-expansion of the gap. */
  final case class EckertIv(lon0: Double = 0.0, fe: Double = 0.0, fn: Double = 0.0,
                            r: Double = WGS84_A, unit: Double = 1.0) extends CrsTransform {
    private val l0 = math.toRadians(lon0)
    private val cx = 2.0 / math.sqrt(math.Pi * (4.0 + math.Pi))     // 0.4222382…
    private val cy = 2.0 * math.sqrt(math.Pi / (4.0 + math.Pi))     // 1.3265004…
    private val cp = 2.0 + math.Pi / 2.0

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val c = cp * math.sin(phi)
      var t =
        if (cp - math.abs(c) < 1e-4) // gap ≈ u² near the pole: seed u = √gap
          math.signum(phi) * (math.Pi / 2 - math.sqrt(math.max(0, cp - math.abs(c))))
        else phi / 2
      if (math.Pi / 2 - math.abs(phi) < 1e-10) t = math.signum(phi) * math.Pi / 2
      else {
        var i = 0
        var corr = 1.0
        while (i < 50 && math.abs(corr) > 1e-13) {
          val cosT = math.cos(t)
          corr = (t + math.sin(t) * cosT + 2 * math.sin(t) - c) / (2 * cosT * (1 + cosT))
          t -= corr
          i += 1
        }
      }
      val x = cx * r * (math.toRadians(lon) - l0) * (1 + math.cos(t))
      (x / unit + fe, (cy * r * math.sin(t)) / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.asin(math.min(1, math.max(-1, (y - fn) * unit / (cy * r))))
      val phi = math.asin(math.min(1, math.max(-1,
        (t + math.sin(t) * math.cos(t) + 2 * math.sin(t)) / cp)))
      val lam =
        if (1 + math.cos(t) < 1e-12) l0
        else l0 + (x - fe) * unit / (cx * r * (1 + math.cos(t)))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Lambert Azimuthal Equal Area, oblique ellipsoidal (EPSG method 9820,
    * Snyder eq. 24-2..24-21) — EPSG:3035 is ETRS89-extended / LAEA Europe,
    * the EU statistical-grid CRS. Degenerate at a polar center (cos β1 =
    * 0); the polar EASE grids stay out of the registry for that reason.
    * φ recovered from the authalic q with the same correction iteration
    * as [[Albers2Sp]]. */
  final case class Laea(lat0: Double, lon0: Double, fe: Double, fn: Double,
                        unit: Double = 1.0, a: Double = WGS84_A,
                        flattening: Double = GRS80_F) extends CrsTransform {
    private val e2 = math.max(flattening * (2 - flattening), 1e-20)
    private val e = math.sqrt(e2)
    private def q(phi: Double) = authalicQ(phi, e, e2)
    private def m(phi: Double) = math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val qp = q(math.Pi / 2)
    private val beta1 = math.asin(q(p0) / qp)
    private val rq = a * math.sqrt(qp / 2)
    private val d = a * m(p0) / (rq * math.cos(beta1))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val beta = math.asin(math.min(1, math.max(-1, q(phi) / qp)))
      val dl = lam - l0
      val b = rq * math.sqrt(2 / (1 + math.sin(beta1) * math.sin(beta) +
        math.cos(beta1) * math.cos(beta) * math.cos(dl)))
      val xm = b * d * math.cos(beta) * math.sin(dl)
      val ym = (b / d) * (math.cos(beta1) * math.sin(beta) -
        math.sin(beta1) * math.cos(beta) * math.cos(dl))
      (xm / unit + fe, ym / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xm = (x - fe) * unit
      val ym = (y - fn) * unit
      val rho = math.hypot(xm / d, d * ym)
      if (rho < 1e-12) return (lon0, lat0)
      val ce = 2 * math.asin(math.min(1, rho / (2 * rq)))
      val qq = qp * (math.cos(ce) * math.sin(beta1) +
        d * ym * math.sin(ce) * math.cos(beta1) / rho)
      val lam = l0 + math.atan2(xm * math.sin(ce),
        d * rho * math.cos(beta1) * math.cos(ce) - d * d * ym * math.sin(beta1) * math.sin(ce))
      val phi = phiFromQ(qq, e, e2)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Mercator, 1SP / variant A (EPSG 9804): [[WorldMercator]]
    * generalized to any central meridian, scale, ellipsoid and unit. The
    * 2SP / variant B method derives k0 = m(sp1) before constructing. */
  final case class Merc1Sp(lon0: Double, k0: Double, fe: Double, fn: Double,
                           unit: Double = 1.0, a: Double = WGS84_A,
                           flattening: Double = WGS84_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private val l0 = math.toRadians(lon0)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val esin = e * math.sin(phi)
      val y = a * k0 * math.log(math.tan(math.Pi / 4 + phi / 2) * math.pow((1 - esin) / (1 + esin), e / 2))
      (a * k0 * (math.toRadians(lon) - l0) / unit + fe, y / unit + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-(y - fn) * unit / (a * k0))
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        i += 1
      }
      (math.toDegrees(l0 + (x - fe) * unit / (a * k0)), math.toDegrees(phi))
    }
  }

  /** Spherical (web) mercator over an arbitrary sphere radius — the
    * "Popular Visualisation Pseudo Mercator" method (EPSG 1024) that WKT
    * definitions of 3857-family CRS carry. */
  final case class PseudoMerc(lon0: Double, fe: Double, fn: Double,
                              unit: Double = 1.0, a: Double = WGS84_A) extends CrsTransform {
    private val l0 = math.toRadians(lon0)
    def forward(lon: Double, lat: Double): (Double, Double) =
      ((a * (math.toRadians(lon) - l0)) / unit + fe,
        (a * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))) / unit + fn)
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(l0 + (x - fe) * unit / a),
        math.toDegrees(2 * math.atan(math.exp((y - fn) * unit / a)) - math.Pi / 2))
  }

  /** Airy 1830 ellipsoid (OSGB36 / British National Grid). */
  val AIRY_A = 6377563.396
  val AIRY_F = 1.0 / 299.3249646
  /** Bessel 1841 ellipsoid (Amersfoort / Dutch RD). */
  val BESSEL_A = 6377397.155
  val BESSEL_F = 1.0 / 299.1528128

  /** 7-parameter Helmert datum shift (EPSG position-vector convention,
    * method 9606), applied in geocentric coordinates with h=0. Parameters
    * are FROM WGS84 TO the target datum; the inverse negates them (the
    * standard small-angle approximation — sub-mm at these magnitudes).
    * Grid-free accuracy for OSGB36 is ~2-5 m, the same class as GDAL
    * without NTv2 grids — documented divergence from grid-shifted PROJ. */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
                           rxSec: Double, rySec: Double, rzSec: Double, sPpm: Double,
                           aDst: Double, fDst: Double,
                           aSrc: Double = WGS84_A, fSrc: Double = WGS84_F) {
    private def toXyz(lon: Double, lat: Double, a: Double, f: Double): (Double, Double, Double) = {
      val e2 = f * (2 - f)
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val n = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      (n * math.cos(phi) * math.cos(lam), n * math.cos(phi) * math.sin(lam),
        n * (1 - e2) * math.sin(phi))
    }
    private def toGeodetic(x: Double, y: Double, z: Double, a: Double, f: Double): (Double, Double) = {
      val e2 = f * (2 - f)
      val p = math.hypot(x, y)
      var phi = math.atan2(z, p * (1 - e2))
      var i = 0
      while (i < 12) {
        val n = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
        phi = math.atan2(z + e2 * n * math.sin(phi), p)
        i += 1
      }
      (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
    }
    private def apply7(x: Double, y: Double, z: Double, sign: Double): (Double, Double, Double) = {
      val s = 1.0 + sign * sPpm * 1e-6
      val rx = sign * math.toRadians(rxSec / 3600.0)
      val ry = sign * math.toRadians(rySec / 3600.0)
      val rz = sign * math.toRadians(rzSec / 3600.0)
      (s * (x - rz * y + ry * z) + sign * tx,
        s * (rz * x + y - rx * z) + sign * ty,
        s * (-ry * x + rx * y + z) + sign * tz)
    }
    /** WGS84 geographic -> target-datum geographic. */
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val (x, y, z) = toXyz(lon, lat, aSrc, fSrc)
      val (x2, y2, z2) = apply7(x, y, z, 1.0)
      toGeodetic(x2, y2, z2, aDst, fDst)
    }
    /** Target-datum geographic -> WGS84. */
    def inverse(lon: Double, lat: Double): (Double, Double) = {
      val (x, y, z) = toXyz(lon, lat, aDst, fDst)
      val (x2, y2, z2) = apply7(x, y, z, -1.0)
      toGeodetic(x2, y2, z2, aSrc, fSrc)
    }
  }

  /** A projected CRS on a non-WGS84 datum: Helmert shift to the datum,
    * then the map projection on that datum's ellipsoid. */
  final case class DatumProjected(h: Helmert, proj: CrsTransform) extends CrsTransform {
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val (lo, la) = h.forward(lon, lat)
      proj.forward(lo, la)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (lo, la) = proj.inverse(x, y)
      h.inverse(lo, la)
    }
  }

  /** Oblique Stereographic, EPSG method 9809 (the "double projection":
    * ellipsoid -> conformal sphere -> spherical stereographic) — the Dutch
    * RD and several other national grids. Forward follows EPSG Guidance
    * Note 7-2; the inverse is a damped 2-D Newton solve of the forward
    * (finite-difference Jacobian, converges to sub-mm in <10 iterations) —
    * numerically robust and self-verifying against the forward. */
  final case class ObliqueStereo(lat0: Double, lon0: Double, k0: Double,
                                 fe: Double, fn: Double, unit: Double = 1.0,
                                 a: Double = WGS84_A, flattening: Double = WGS84_F)
      extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private val phi0 = math.toRadians(lat0)
    private val lam0 = math.toRadians(lon0)
    private val sin0 = math.sin(phi0)
    private val rho0 = a * (1 - e2) / math.pow(1 - e2 * sin0 * sin0, 1.5)
    private val nu0 = a / math.sqrt(1 - e2 * sin0 * sin0)
    private val bigR = math.sqrt(rho0 * nu0)
    private val n = math.sqrt(1 + e2 * math.pow(math.cos(phi0), 4) / (1 - e2))
    private val s1 = (1 + sin0) / (1 - sin0)
    private val s2 = (1 - e * sin0) / (1 + e * sin0)
    private val w1 = math.pow(s1 * math.pow(s2, e), n)
    private val sinChi00 = (w1 - 1) / (w1 + 1)
    private val c = (n + sin0) * (1 - sinChi00) / ((n - sin0) * (1 + sinChi00))
    private val w2 = c * w1
    private val chi0 = math.asin((w2 - 1) / (w2 + 1))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val sa = (1 + math.sin(phi)) / (1 - math.sin(phi))
      val sb = (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
      val w = c * math.pow(sa * math.pow(sb, e), n)
      val chi = math.asin((w - 1) / (w + 1))
      val dLam = n * (lam - lam0)
      val b = 1 + math.sin(chi) * math.sin(chi0) + math.cos(chi) * math.cos(chi0) * math.cos(dLam)
      val x = 2 * bigR * k0 * math.cos(chi) * math.sin(dLam) / b
      val y = 2 * bigR * k0 * (math.sin(chi) * math.cos(chi0) - math.cos(chi) * math.sin(chi0) * math.cos(dLam)) / b
      (x / unit + fe, y / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      var lon = lon0
      var lat = lat0
      val epsDeg = 1e-7
      var i = 0
      while (i < 25) {
        val (fx, fy) = forward(lon, lat)
        val dx = x - fx
        val dy = y - fy
        if (math.abs(dx) < 1e-9 && math.abs(dy) < 1e-9) i = 25
        else {
          val (fxl, fyl) = forward(lon + epsDeg, lat)
          val (fxp, fyp) = forward(lon, lat + epsDeg)
          val j11 = (fxl - fx) / epsDeg; val j12 = (fxp - fx) / epsDeg
          val j21 = (fyl - fy) / epsDeg; val j22 = (fyp - fy) / epsDeg
          val det = j11 * j22 - j12 * j21
          if (det == 0) i = 25
          else {
            lon += (dx * j22 - dy * j12) / det
            lat += (dy * j11 - dx * j21) / det
          }
        }
        i += 1
      }
      (lon, lat)
    }
  }

  /** Hotine Oblique Mercator — EPSG methods 9812 (variant A) and 9815
    * (variant B), per EPSG Guidance Note 7-2 and Snyder (1987) pp. 66-75.
    * The grid develops along an initial line through the projection centre
    * (latC, lonC) at azimuth `alphaC`; `gammaC` is the rectified-grid
    * angle (defaults to alphaC in most definitions). Variant B anchors the
    * false coordinates at the projection centre itself — the form of the
    * Swiss LV03/LV95 and Hungarian EOV grids, where alphaC = gammaC = 90
    * and the initial line runs due east through the origin. Reference:
    * geopandas to_crs via pyproj `+proj=omerc` (array.py:1098-1187). */
  final case class HotineOM(latC: Double, lonC: Double, alphaC: Double, gammaC: Double,
                            k0: Double, fe: Double, fn: Double, variantB: Boolean,
                            unit: Double = 1.0, a: Double = WGS84_A,
                            flattening: Double = WGS84_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private val phiC = math.toRadians(latC)
    private val lamC = math.toRadians(lonC)
    private val alpha = math.toRadians(alphaC)
    private val gamma = math.toRadians(gammaC)
    private val cosC = math.cos(phiC)
    private val sinC = math.sin(phiC)
    private val bigB = math.sqrt(1 + e2 * math.pow(cosC, 4) / (1 - e2))
    private val bigA = a * bigB * k0 * math.sqrt(1 - e2) / (1 - e2 * sinC * sinC)
    private def tOf(phi: Double): Double = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), e / 2)
    }
    private val t0 = tOf(phiC)
    private val bigD = math.max(1.0,
      bigB * math.sqrt(1 - e2) / (cosC * math.sqrt(1 - e2 * sinC * sinC)))
    private val signPhiC = if (phiC < 0) -1.0 else 1.0
    private val bigF = bigD + math.sqrt(bigD * bigD - 1) * signPhiC
    private val bigH = bigF * math.pow(t0, bigB)
    private val bigG = (bigF - 1 / bigF) / 2
    private val gamma0 = math.asin(math.sin(alpha) / bigD)
    // at alpha = 90 the argument is analytically exactly 1 (G tan(gamma0) =
    // sqrt(D^2-1)/sqrt(D^2-1)) but can land at 1 + 2 ulp — clamp, not NaN
    private val lam0 =
      lamC - math.asin(math.max(-1.0, math.min(1.0, bigG * math.tan(gamma0)))) / bigB
    // skew-grid offset of the projection centre (variant B). The general
    // atan2 form degenerates at alpha = 90 (cos alpha = 0 regardless of D);
    // there the equivalent closed form is A * (lamC - lam0).
    private val uC =
      if (!variantB) 0.0
      else if (math.abs(alphaC) == 90.0) bigA * (lamC - lam0)
      else (bigA / bigB) * math.atan2(math.sqrt(bigD * bigD - 1), math.cos(alpha)) * signPhiC
    private val cosGam = math.cos(gamma)
    private val sinGam = math.sin(gamma)
    private val cosG0 = math.cos(gamma0)
    private val sinG0 = math.sin(gamma0)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val q = bigH / math.pow(tOf(phi), bigB)
      val s = (q - 1 / q) / 2
      val tBig = (q + 1 / q) / 2
      val dl = bigB * (lam - lam0)
      val v = math.sin(dl)
      val bigU = (-v * cosG0 + s * sinG0) / tBig
      val vv = bigA * math.log((1 - bigU) / (1 + bigU)) / (2 * bigB)
      val uu = bigA * math.atan2(s * cosG0 + v * sinG0, math.cos(dl)) / bigB - uC
      ((vv * cosGam + uu * sinGam) / unit + fe,
        (uu * cosGam - vv * sinGam) / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val de = (x - fe) * unit
      val dn = (y - fn) * unit
      val vv = de * cosGam - dn * sinGam
      val uu = dn * cosGam + de * sinGam + uC
      val q = math.exp(-bigB * vv / bigA)
      val s = (q - 1 / q) / 2
      val tBig = (q + 1 / q) / 2
      val v = math.sin(bigB * uu / bigA)
      val bigU = (v * cosG0 + s * sinG0) / tBig
      val t = math.pow(bigH / math.sqrt((1 + bigU) / (1 - bigU)), 1 / bigB)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        i += 1
      }
      val lam = lam0 - math.atan2(s * cosG0 - v * sinG0, math.cos(bigB * uu / bigA)) / bigB
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Krovak — EPSG method 9819 (southing/westing axes) and its East-North
    * orientation 1041 (EPSG:5514, both axes negated), per EPSG Guidance
    * Note 7-2: Gaussian conformal sphere, oblique cone touching the pseudo
    * standard parallel `latP1`, azimuthal development from the cone axis
    * co-latitude `alphaC`. `lonO` is the longitude of origin RELATIVE TO
    * GREENWICH (the registry's 24°50'E of Ferro form must be shifted by
    * the caller/WKT). The Czech/Slovak S-JTSK national grid. */
  final case class Krovak(latC: Double, lonO: Double, alphaC: Double, latP1: Double,
                          kP: Double, fe: Double, fn: Double, eastNorth: Boolean,
                          unit: Double = 1.0, a: Double = BESSEL_A,
                          flattening: Double = BESSEL_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private val phiC = math.toRadians(latC)
    private val lam0 = math.toRadians(lonO)
    private val alpha = math.toRadians(alphaC)
    private val phiP = math.toRadians(latP1)
    private val sinC = math.sin(phiC)
    private val cosC = math.cos(phiC)
    private val bigA = a * math.sqrt(1 - e2) / (1 - e2 * sinC * sinC)
    private val bigB = math.sqrt(1 + e2 * math.pow(cosC, 4) / (1 - e2))
    private val gamma0 = math.asin(sinC / bigB)
    private val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1 + e * sinC) / (1 - e * sinC), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bigB)
    private val n = math.sin(phiP)
    private val r0 = kP * bigA / math.tan(phiP)
    private val tanPn = math.pow(math.tan(phiP / 2 + math.Pi / 4), n)
    private val cosA = math.cos(alpha)
    private val sinA = math.sin(alpha)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val esin = e * math.sin(phi)
      val bigU = 2 * (math.atan(t0 * math.pow(math.tan(phi / 2 + math.Pi / 4), bigB) /
        math.pow((1 + esin) / (1 - esin), e * bigB / 2)) - math.Pi / 4)
      val bigV = bigB * (lam0 - math.toRadians(lon))
      val bigT = math.asin(cosA * math.sin(bigU) + sinA * math.cos(bigU) * math.cos(bigV))
      val bigD = math.asin(math.cos(bigU) * math.sin(bigV) / math.cos(bigT))
      val theta = n * bigD
      val r = r0 * tanPn / math.pow(math.tan(bigT / 2 + math.Pi / 4), n)
      val xSouth = r * math.cos(theta)
      val yWest = r * math.sin(theta)
      if (eastNorth) (-yWest / unit + fe, -xSouth / unit + fn)
      else (xSouth / unit + fe, yWest / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val (xSouth, yWest) =
        if (eastNorth) (-(y - fn) * unit, -(x - fe) * unit)
        else ((x - fe) * unit, (y - fn) * unit)
      val r = math.sqrt(xSouth * xSouth + yWest * yWest)
      val theta = math.atan2(yWest, xSouth)
      val bigD = theta / n
      val bigT = 2 * (math.atan(math.pow(r0 * tanPn / r, 1 / n)) - math.Pi / 4)
      val bigU = math.asin(cosA * math.sin(bigT) - sinA * math.cos(bigT) * math.cos(bigD))
      val bigV = math.asin(math.cos(bigT) * math.sin(bigD) / math.cos(bigU))
      val lam = lam0 - bigV / bigB
      // iterate the Gaussian-sphere latitude back to geodetic
      var phi = bigU
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        phi = 2 * (math.atan(math.pow(1 / t0, 1 / bigB) *
          math.pow(math.tan(bigU / 2 + math.Pi / 4), 1 / bigB) *
          math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 4)
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Cassini-Soldner (EPSG method 9806) — the old cadastral grids
    * (Trinidad, parts of Malaysia/Germany/Denmark), per EPSG GN7-2 /
    * Snyder (1987) pp. 92-95. Transverse equidistant: exact along the
    * central meridian, series in the (small) departure from it. */
  final case class Cassini(lat0: Double, lon0: Double, fe: Double, fn: Double,
                           unit: Double = 1.0, a: Double = WGS84_A,
                           flattening: Double = WGS84_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val ep2 = e2 / (1 - e2)
    private val l0 = math.toRadians(lon0)
    private def meridianArc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    private val m0 = meridianArc(math.toRadians(lat0))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val nu = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ep2 * cosP * cosP
      val aa = cosP * (math.toRadians(lon) - l0)
      val x = nu * (aa - t * aa * aa * aa / 6
        - (8 - t + 8 * c) * t * math.pow(aa, 5) / 120)
      val y = meridianArc(phi) - m0 +
        nu * tanP * (aa * aa / 2 + (5 - t + 6 * c) * math.pow(aa, 4) / 24)
      (x / unit + fe, y / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val m1 = m0 + (y - fn) * unit
      val mu = m1 / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val t1 = tanP * tanP
      val nu1 = a / math.sqrt(1 - e2 * sinP * sinP)
      val rho1 = a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
      val d = (x - fe) * unit / nu1
      val lat = phi1 - (nu1 * tanP / rho1) * (d * d / 2 - (1 + 3 * t1) * math.pow(d, 4) / 24)
      val lon = l0 + (d - t1 * d * d * d / 3 + (1 + 3 * t1) * t1 * math.pow(d, 5) / 15) / cosP
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** Equidistant Cylindrical (EPSG method 1028; the spherical lat0=lat1=0
    * case is Plate Carrée, method 1029/ESRI Equirectangular): exact
    * meridian arc for northing, parallel arc at the standard parallel for
    * easting. EPSG:4087 / 32662 world grids. */
  final case class EquidistantCyl(lat1: Double, lat0: Double, lon0: Double,
                                  fe: Double, fn: Double, unit: Double = 1.0,
                                  a: Double = WGS84_A,
                                  flattening: Double = WGS84_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val l0 = math.toRadians(lon0)
    private val phi1 = math.toRadians(lat1)
    private val nu1CosP1 = a * math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) * math.sin(phi1))
    private def meridianArc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    private val m0 = meridianArc(math.toRadians(lat0))

    def forward(lon: Double, lat: Double): (Double, Double) =
      ((nu1CosP1 * (math.toRadians(lon) - l0)) / unit + fe,
        (meridianArc(math.toRadians(lat)) - m0) / unit + fn)

    def inverse(x: Double, y: Double): (Double, Double) = {
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val mu = (m0 + (y - fn) * unit) /
        (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val phi = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      (math.toDegrees(l0 + (x - fe) * unit / nu1CosP1), math.toDegrees(phi))
    }
  }

  /** American Polyconic (EPSG method 9818; Snyder 1987 eq. 18-12..18-15) —
    * Brazil's classic national grid (EPSG:29101) and the old USGS
    * quadrangles. The central meridian is exact (the meridian arc), every
    * parallel is an arc of a circle of radius nu*cot(phi) centered on the
    * central meridian, and parallels are true to scale — the three
    * properties the spec verifies as a self-oracle. Inverse is the same
    * 2D Newton iteration as [[ObliqueStereo]]. */
  final case class Polyconic(lat0: Double, lon0: Double, fe: Double, fn: Double,
                             unit: Double = 1.0, a: Double = WGS84_A,
                             flattening: Double = WGS84_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val l0 = math.toRadians(lon0)
    private def meridianArc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    private val m0 = meridianArc(math.toRadians(lat0))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(lon) - l0
      if (math.abs(phi) < 1e-12) (a * dl / unit + fe, -m0 / unit + fn)
      else {
        val sinP = math.sin(phi)
        val nuCot = a / math.sqrt(1 - e2 * sinP * sinP) / math.tan(phi)
        val bigE = dl * sinP
        ((nuCot * math.sin(bigE)) / unit + fe,
          (meridianArc(phi) - m0 + nuCot * (1 - math.cos(bigE))) / unit + fn)
      }
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      var lon = lon0 + (x - fe) * unit / a * (180.0 / math.Pi) / 2
      var lat = lat0 + (y - fn) * unit / a * (180.0 / math.Pi) / 2
      if (lat == 0.0) lat = 1e-7
      val epsDeg = 1e-7
      var i = 0
      while (i < 25) {
        val (fx, fy) = forward(lon, lat)
        val dx = x - fx
        val dy = y - fy
        if (math.abs(dx) < 1e-9 && math.abs(dy) < 1e-9) i = 25
        else {
          val (fxl, fyl) = forward(lon + epsDeg, lat)
          val (fxp, fyp) = forward(lon, lat + epsDeg)
          val j11 = (fxl - fx) / epsDeg; val j12 = (fxp - fx) / epsDeg
          val j21 = (fyl - fy) / epsDeg; val j22 = (fyp - fy) / epsDeg
          val det = j11 * j22 - j12 * j21
          if (det == 0) i = 25
          else {
            lon += (dx * j22 - dy * j12) / det
            lat += (dy * j11 - dx * j21) / det
          }
        }
        i += 1
      }
      (lon, lat)
    }
  }

  /** Azimuthal Equidistant, spherical on R = a (Snyder 1987 eq. 25-1..25-4)
    * — ESRI World_Azimuthal_Equidistant (54032) and the ad-hoc
    * point-centered metric frames geopandas users build for buffering
    * (pyproj `+proj=aeqd +lat_0 +lon_0`). Distance AND azimuth from the
    * centre are exact on the sphere; the EPSG ellipsoidal "Modified
    * Azimuthal Equidistant" (9832) is a different method and stays
    * unsupported rather than silently approximated. */
  final case class AzimuthalEquidistant(lat0: Double, lon0: Double,
                                        fe: Double = 0.0, fn: Double = 0.0,
                                        unit: Double = 1.0, a: Double = WGS84_A)
      extends CrsTransform {
    private val phi0 = math.toRadians(lat0)
    private val lam0 = math.toRadians(lon0)
    private val sin0 = math.sin(phi0)
    private val cos0 = math.cos(phi0)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(lon) - lam0
      val cosC = math.max(-1.0, math.min(1.0,
        sin0 * math.sin(phi) + cos0 * math.cos(phi) * math.cos(dl)))
      val c = math.acos(cosC)
      val kp = if (c < 1e-12) 1.0 else c / math.sin(c)
      val x = a * kp * math.cos(phi) * math.sin(dl)
      val y = a * kp * (cos0 * math.sin(phi) - sin0 * math.cos(phi) * math.cos(dl))
      (x / unit + fe, y / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - fe) * unit
      val dy = (y - fn) * unit
      val rho = math.sqrt(dx * dx + dy * dy)
      if (rho < 1e-9) return (lon0, lat0)
      val c = rho / a
      val sinC = math.sin(c); val cosC = math.cos(c)
      val phi = math.asin(math.max(-1.0, math.min(1.0,
        cosC * sin0 + dy * sinC * cos0 / rho)))
      val lam = lam0 + math.atan2(dx * sinC, rho * cos0 * cosC - dy * sin0 * sinC)
      // atan2 lands in (lam0 - pi, lam0 + pi]; normalize to [-180, 180)
      val lamDeg = math.toDegrees(lam)
      (lamDeg - 360.0 * math.floor((lamDeg + 180.0) / 360.0), math.toDegrees(phi))
    }
  }

  /** Two-Point Equidistant (Snyder, Map Projections — A Working Manual,
    * pp. 192-195; +proj=tpeqd): spherical on R = a, like the repo's other
    * azimuthal-family spherical forms. Distances from BOTH base points are
    * true by construction — the plane position is the intersection of the
    * two distance circles, which is also the projection's own closed-form
    * oracle (the spec checks mapped distances against great-circle ones).
    * Axes: origin at the midpoint of the base-point axis, +x toward the
    * 2nd point, +y on the side of the great circle containing points left
    * of the 1st→2nd direction (north-up for equatorial base points). */
  final case class TwoPointEquidistant(lat1: Double, lon1: Double,
                                       lat2: Double, lon2: Double,
                                       fe: Double = 0.0, fn: Double = 0.0,
                                       unit: Double = 1.0, a: Double = WGS84_A)
      extends CrsTransform {
    private def unitVec(lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
      val la = math.toRadians(latDeg); val lo = math.toRadians(lonDeg)
      (math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))
    }
    private val va = unitVec(lon1, lat1)
    private val vb = unitVec(lon2, lat2)
    private def dot(u: (Double, Double, Double), v: (Double, Double, Double)) =
      u._1 * v._1 + u._2 * v._2 + u._3 * v._3
    // chord-based angular distance (2 asin(chord/2)): stable near 0, where
    // acos(dot) loses ~8 digits — at the base points themselves that
    // cancellation showed up as a ~0.1 m phantom offset
    private def angDist(u: (Double, Double, Double), v: (Double, Double, Double)): Double = {
      val dx = u._1 - v._1; val dy = u._2 - v._2; val dz = u._3 - v._3
      2.0 * math.asin(math.min(1.0, math.sqrt(dx * dx + dy * dy + dz * dz) / 2))
    }
    private val c = angDist(va, vb) // angular distance between base points
    private val cosC = math.cos(c)
    // 1e-6 rad (~6 m) margins: catches exact AND floating-point-near
    // degenerate pairs (an antipode built from negated coordinates lands
    // within ~1e-8 rad of pi, not at it)
    require(c > 1e-6 && c < math.Pi - 1e-6,
      s"Two-Point Equidistant base points must be distinct and non-antipodal " +
        s"(($lat1,$lon1) vs ($lat2,$lon2))")
    private val sinC = math.sin(c)
    // normal of the base great circle: +y side is where (A x B) . P > 0
    private val nrm = (va._2 * vb._3 - va._3 * vb._2,
      va._3 * vb._1 - va._1 * vb._3, va._1 * vb._2 - va._2 * vb._1)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val p = unitVec(lon, lat)
      val za = angDist(va, p)
      val zb = angDist(vb, p)
      // circles around A at (-c/2, 0) and B at (+c/2, 0): x from the circle
      // power difference, y from either circle (clamped: the spherical
      // triangle inequality keeps the radicand >= 0 up to rounding)
      val x = a * (za * za - zb * zb) / (2 * c)
      val xa = x + a * c / 2
      val y2 = a * a * za * za - xa * xa
      val y = math.sqrt(math.max(0.0, y2)) * (if (dot(nrm, p) >= 0) 1.0 else -1.0)
      (x / unit + fe, y / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - fe) * unit
      val dy = (y - fn) * unit
      val za = math.sqrt((dx + a * c / 2) * (dx + a * c / 2) + dy * dy) / a
      val zb = math.sqrt((dx - a * c / 2) * (dx - a * c / 2) + dy * dy) / a
      // P = alpha*A + beta*B + gamma*(A x B): solve P.A = cos za, P.B = cos zb
      val alpha = (math.cos(za) - cosC * math.cos(zb)) / (sinC * sinC)
      val beta = (math.cos(zb) - cosC * math.cos(za)) / (sinC * sinC)
      val g2 = (1.0 - (alpha * alpha + beta * beta + 2 * alpha * beta * cosC)) / (sinC * sinC)
      val gamma = math.sqrt(math.max(0.0, g2)) * (if (dy >= 0) 1.0 else -1.0)
      val px = alpha * va._1 + beta * vb._1 + gamma * nrm._1
      val py = alpha * va._2 + beta * vb._2 + gamma * nrm._2
      val pz = alpha * va._3 + beta * vb._3 + gamma * nrm._3
      val r = math.sqrt(px * px + py * py + pz * pz)
      val lat = math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, pz / r))))
      val lonDeg = math.toDegrees(math.atan2(py, px))
      (lonDeg - 360.0 * math.floor((lonDeg + 180.0) / 360.0), lat)
    }
  }

  val INTL_A = 6378388.0 // International 1924 (Hayford)
  val INTL_F = 1.0 / 297.0

  /** New Zealand Map Grid — EPSG method 9811 (EPSG:27200, NZGD49 / NZMG).
    * The published definition (Reilly, "A conformal mapping projection with
    * minimum scale error", Survey Review 1973; EPSG Guidance Note 7-2): the
    * latitude offset (in 1e-5-arcsec units) maps through a 10-term series
    * to the ISOMETRIC latitude difference, then a fixed 6th-degree complex
    * polynomial — the projection's DEFINING minimum-scale-error
    * coefficients, published in the EPSG registry — maps the isometric
    * plane to grid metres on International 1924. The inverse
    * Newton-iterates the same defining polynomial (no separate
    * inverse-series digits to trust), and ProjParseSpec validates the psi
    * series against the closed-form isometric latitude plus the GN7-2
    * worked example. Origin is fixed by the definition: 41S, 173E. */
  final case class Nzmg(fe: Double = 2510000.0, fn: Double = 6023150.0,
                        unit: Double = 1.0) extends CrsTransform {
    private val a = INTL_A
    private val e2 = INTL_F * (2 - INTL_F)
    private[graft] val e = math.sqrt(e2)
    private val lat0 = -41.0
    private val lon0 = math.toRadians(173.0)
    private val Sec5PerDeg = 3600.0e-5 // degrees -> 1e-5-arcsec units

    // Delta-phi (1e-5 arcsec) -> Delta-psi (isometric latitude, radians-
    // compatible): d(psi)/d(phi_rad) at -41 = tpsi(0) * (sec5 per radian)
    // = 0.63992 * 2.06265 = 1.31992 = M/(N cos phi) there — the series is
    // the Taylor fit of the true isometric latitude (spec-checked).
    private[graft] val tpsi = Array(0.6399175073, -0.1358797613, 0.063294409,
      -0.02526853, 0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
    private[graft] val tphi = Array(1.5627014243, 0.5185406398, -0.03333098,
      -0.1052906, -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)
    // the defining complex coefficients B1..B6 (EPSG GN7-2 / registry)
    private val bfR = Array(0.7557853228, 0.249204646, -0.001541739,
      -0.10162907, -0.26623489, -0.6870983)
    private val bfI = Array(0.0, 0.003371507, 0.041058560,
      0.01727609, -0.36249218, -1.1651967)

    /** sum cs(k) x^(k+1) (zero constant term), Horner. */
    private[graft] def poly(cs: Array[Double], x: Double): Double = {
      var fv = 0.0; var i = cs.length - 1
      while (i >= 0) { fv = cs(i) + x * fv; i -= 1 }
      fv * x
    }
    /** complex sum_{k>=1} (bfR,bfI)(k) z^k. */
    private def zpoly(zr: Double, zi: Double): (Double, Double) = {
      var fr = 0.0; var fi = 0.0; var k = bfR.length - 1
      while (k >= 0) {
        val tr = fr * zr - fi * zi + bfR(k)
        fi = fr * zi + fi * zr + bfI(k)
        fr = tr
        k -= 1
      }
      (fr * zr - fi * zi, fr * zi + fi * zr)
    }
    /** derivative sum k (bfR,bfI)(k) z^(k-1). */
    private def zpolyD(zr: Double, zi: Double): (Double, Double) = {
      var fr = 0.0; var fi = 0.0; var k = bfR.length - 1
      while (k >= 0) {
        val tr = fr * zr - fi * zi + (k + 1) * bfR(k)
        fi = fr * zi + fi * zr + (k + 1) * bfI(k)
        fr = tr
        k -= 1
      }
      (fr, fi)
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val dphi = (lat - lat0) * Sec5PerDeg
      val psi = poly(tpsi, dphi)
      val dlam = math.toRadians(lon) - lon0
      val (wr, wi) = zpoly(psi, dlam)
      (a * wi / unit + fe, a * wr / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val zr = (y - fn) * unit / a
      val zi = (x - fe) * unit / a
      // Newton on the defining polynomial, seeded at z itself (B1 ~ 0.76
      // dominates over the grid's domain, so the identity seed converges;
      // no separately-published seed series to transcribe)
      var hr = zr; var hi = zi
      var k = 0
      var moved = 1.0
      while (k < 30 && moved > 1e-16) {
        val (fr0, fi0) = zpoly(hr, hi)
        val (dr, di) = zpolyD(hr, hi)
        val nr = fr0 - zr; val ni = fi0 - zi
        val den = dr * dr + di * di
        val sr = (nr * dr + ni * di) / den
        val si = (ni * dr - nr * di) / den
        hr -= sr; hi -= si
        moved = math.abs(sr) + math.abs(si)
        k += 1
      }
      val dphi = poly(tphi, hr)
      (math.toDegrees(lon0 + hi), lat0 + dphi / Sec5PerDeg)
    }
  }

  /** Laborde Oblique Mercator — EPSG method 9813 (EPSG:29701/29702,
    * Tananarive / Laborde Grid, Madagascar). Per EPSG Guidance Note 7-2:
    * ellipsoid -> conformal sphere (Gauss constants B, phi_s), rotate so
    * the initial line (azimuth alpha through the centre) becomes the
    * pseudo-equator, Mercator-develop, then apply Laborde's cubic complex
    * correction H + G H^3 with G = (1 - cos 2a + i sin 2a)/12. The cubic
    * term is what distinguishes it from Hotine's development (EPSG 9812/
    * 9815): near the centre the two agree to sub-mm (spec-checked against
    * the repo's [[HotineOM]]), diverging away from the initial line. */
  final case class LabordeOM(latC: Double, lonC: Double, azimuthDeg: Double,
                             k0: Double, fe: Double, fn: Double,
                             unit: Double = 1.0, a: Double = INTL_A,
                             flattening: Double = INTL_F) extends CrsTransform {
    private val e2 = flattening * (2 - flattening)
    private val e = math.sqrt(e2)
    private val phiC = math.toRadians(latC)
    private val lamC = math.toRadians(lonC)
    private val alpha = math.toRadians(azimuthDeg)
    private val cosC = math.cos(phiC)
    private val sinC = math.sin(phiC)
    private val bigB = math.sqrt(1 + e2 * math.pow(cosC, 4) / (1 - e2))
    private val phiS = math.asin(sinC / bigB)
    private val bigR = a * k0 * math.sqrt(1 - e2) / (1 - e2 * sinC * sinC)
    private def lnt(phi: Double): Double = {
      val esin = e * math.sin(phi)
      math.log(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - esin) / (1 + esin), e / 2))
    }
    private val bigC = math.log(math.tan(math.Pi / 4 + phiS / 2)) - bigB * lnt(phiC)
    private val gr = (1 - math.cos(2 * alpha)) / 12
    private val gi = math.sin(2 * alpha) / 12
    private val cosS = math.cos(phiS)
    private val sinS = math.sin(phiS)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val bigL = bigB * (math.toRadians(lon) - lamC)
      val q = bigC + bigB * lnt(phi)
      val p = 2 * math.atan(math.exp(q)) - math.Pi / 2
      val cosP = math.cos(p); val sinP = math.sin(p)
      val u = cosP * math.cos(bigL) * cosS + sinP * sinS
      val v = cosP * math.cos(bigL) * sinS - sinP * cosS
      val w = cosP * math.sin(bigL)
      val d = math.hypot(u, v)
      val lp = if (d > 0) math.atan2(v, u) else 0.0
      val pp = math.atan2(w, d)
      val hr = -lp
      val hi = math.log(math.tan(math.Pi / 4 + pp / 2))
      // H + G H^3
      val h2r = hr * hr - hi * hi; val h2i = 2 * hr * hi
      val h3r = h2r * hr - h2i * hi; val h3i = h2r * hi + h2i * hr
      val wr = hr + gr * h3r - gi * h3i
      val wi = hi + gr * h3i + gi * h3r
      (bigR * wi / unit + fe, bigR * wr / unit + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val zr = (y - fn) * unit / bigR
      val zi = (x - fe) * unit / bigR
      // Newton: solve H + G H^3 = z (seed z; |G| <= 1/6 keeps it contractive
      // over the grid's domain)
      var hr = zr; var hi = zi
      var k = 0
      var moved = 1.0
      while (k < 30 && moved > 1e-16) {
        val h2r = hr * hr - hi * hi; val h2i = 2 * hr * hi
        val h3r = h2r * hr - h2i * hi; val h3i = h2r * hi + h2i * hr
        val fr0 = hr + gr * h3r - gi * h3i - zr
        val fi0 = hi + gr * h3i + gi * h3r - zi
        val dr = 1 + 3 * (gr * h2r - gi * h2i)
        val di = 3 * (gr * h2i + gi * h2r)
        val den = dr * dr + di * di
        val sr = (fr0 * dr + fi0 * di) / den
        val si = (fi0 * dr - fr0 * di) / den
        hr -= sr; hi -= si
        moved = math.abs(sr) + math.abs(si)
        k += 1
      }
      val lp = -hr
      val pp = 2 * math.atan(math.exp(hi)) - math.Pi / 2
      val up = math.cos(pp) * math.cos(lp)
      val vp = math.cos(pp) * math.sin(lp)
      val wp = math.sin(pp)
      // inverse (transpose) of the forward sphere rotation
      val u1 = up * cosS + vp * sinS
      val u2 = wp
      val u3 = up * sinS - vp * cosS
      val p = math.asin(math.max(-1.0, math.min(1.0, u3)))
      val bigL = math.atan2(u2, u1)
      val lam = lamC + bigL / bigB
      val tq = math.exp((math.log(math.tan(math.Pi / 4 + p / 2)) - bigC) / bigB)
      var phi = 2 * math.atan(tq) - math.Pi / 2
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        phi = 2 * math.atan(tq * math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 2
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** WGS84 -> OSGB36 (EPSG position-vector, negated from the published
    * OSGB36->WGS84 set in the OS coordinate-systems guide). */
  private def osgb36Helmert: Helmert =
    Helmert(tx = -446.448, ty = 125.157, tz = -542.060,
      rxSec = -0.1502, rySec = -0.2470, rzSec = -0.8421, sPpm = 20.4894,
      aDst = AIRY_A, fDst = AIRY_F)

  /** EPSG code -> transform to/from its geographic base (datum step to WGS84
    * is a null transformation — centimetric for NAD83/GRS80/ETRS89 — except
    * where a Helmert shift is wired, e.g. OSGB36). Parameter values are
    * from the public EPSG registry. */
  def forEpsg(code: Int): Option[CrsTransform] = code match {
    case 4258 => Some(Identity) // ETRS89 geographic ~ WGS84 (cm-level)
    case z if z >= 25828 && z <= 25838 => // ETRS89 / UTM 28N..38N (GRS80 ~ WGS84)
      Some(Utm(z - 25800, north = true))
    case 27700 => // OSGB36 / British National Grid: Helmert + TM on Airy 1830
      Some(DatumProjected(osgb36Helmert,
        Tm(lat0 = 49.0, lonCm = -2.0, k0 = 0.9996012717,
          fe = 400000.0, fn = -100000.0, a = AIRY_A, flattening = AIRY_F)))
    case 4277 => // OSGB36 geographic (datum shift only)
      Some(DatumProjected(osgb36Helmert, Identity))
    case 2154 => // RGF93 / Lambert-93 (France; RGF93 ~ WGS84, GRS80)
      Some(Lcc2Sp(lat0 = 46.5, lon0 = 3.0, sp1 = 49.0, sp2 = 44.0,
        fe = 700000.0, fn = 6600000.0, flattening = GRS80_F))
    case z if z >= 28348 && z <= 28358 => // GDA94 / MGA zones 48-58 (~WGS84)
      Some(Utm(z - 28300, north = false))
    case 2193 => // NZGD2000 / New Zealand Transverse Mercator (~WGS84, GRS80)
      Some(Tm(lat0 = 0.0, lonCm = 173.0, k0 = 0.9996,
        fe = 1600000.0, fn = 10000000.0, flattening = GRS80_F))
    case 28992 => // Amersfoort / RD New: Helmert + oblique stereographic on Bessel 1841
      Some(DatumProjected(
        Helmert(tx = -565.2369, ty = -50.0087, tz = -465.658,
          rxSec = 0.406857, rySec = -0.350733, rzSec = 1.87035, sPpm = -4.0812,
          aDst = BESSEL_A, fDst = BESSEL_F),
        ObliqueStereo(lat0 = 52.0 + 9.0 / 60 + 22.178 / 3600,
          lon0 = 5.0 + 23.0 / 60 + 15.500 / 3600, k0 = 0.9999079,
          fe = 155000.0, fn = 463000.0, a = BESSEL_A, flattening = BESSEL_F)))
    case 4326 | 4269 | 4267 => Some(Identity)
    case 3857 => Some(WebMercator)
    case 3395 => Some(WorldMercator)
    case z if z >= 32601 && z <= 32660 => Some(Utm(z - 32600, north = true))
    case z if z >= 32701 && z <= 32760 => Some(Utm(z - 32700, north = false))
    case z if z >= 26901 && z <= 26923 => Some(Utm(z - 26900, north = true)) // NAD83 UTM approximated as WGS84
    case 2263 => // NAD83 / New York Long Island (ftUS) — the nybb fixture CRS
      Some(Lcc2Sp(lat0 = 40.0 + 10.0 / 60, lon0 = -74.0, sp1 = 41.0 + 2.0 / 60, sp2 = 40.0 + 40.0 / 60,
        fe = 984250.0, fn = 0.0, unit = FtUs))
    case 5070 => // NAD83 / Conus Albers
      Some(Albers2Sp(lat0 = 23.0, lon0 = -96.0, sp1 = 29.5, sp2 = 45.5, fe = 0.0, fn = 0.0))
    case 3413 => // WGS84 / NSIDC Sea Ice Polar Stereographic North
      Some(PolarStereoB(latTs = 70.0, lon0 = -45.0, fe = 0.0, fn = 0.0))
    case 3031 => // WGS84 / Antarctic Polar Stereographic
      Some(PolarStereoB(latTs = -71.0, lon0 = 0.0, fe = 0.0, fn = 0.0))
    case 3976 => // WGS84 / NSIDC Sea Ice Polar Stereographic South
      Some(PolarStereoB(latTs = -70.0, lon0 = 0.0, fe = 0.0, fn = 0.0))
    case 6933 => // WGS84 / NSIDC EASE-Grid 2.0 Global (cylindrical equal-area)
      Some(CylEqualArea(latTs = 30.0, lon0 = 0.0, fe = 0.0, fn = 0.0))
    case 8857 => // WGS84 / Equal Earth Greenwich (equal-area world maps)
      Some(EqualEarth())
    case 54009 => // ESRI:54009 World Mollweide (spherical on R = a)
      Some(Mollweide())
    case 54008 => // ESRI:54008 World Sinusoidal (WGS 84 ellipsoidal)
      Some(Sinusoidal())
    case 54012 => // ESRI:54012 World Eckert IV (spherical on R = a)
      Some(EckertIv())
    case 54017 => // ESRI:54017 World Behrmann: CEA with standard parallel 30
      Some(CylEqualArea(latTs = 30.0, lon0 = 0.0, fe = 0.0, fn = 0.0))
    case 32661 => // WGS 84 / UPS North (k0 at the pole, 2,000 km false origin)
      Some(PolarStereoA(north = true, k0 = 0.994, fe = 2000000.0, fn = 2000000.0))
    case 32761 => // WGS 84 / UPS South
      Some(PolarStereoA(north = false, k0 = 0.994, fe = 2000000.0, fn = 2000000.0))
    case 3035 => // ETRS89-extended / LAEA Europe (the EU statistical grid)
      Some(Laea(lat0 = 52.0, lon0 = 10.0, fe = 4321000.0, fn = 3210000.0))
    case 26985 => // NAD83 / Maryland (m) — LCC 2SP
      Some(Lcc2Sp(lat0 = 37.0 + 40.0 / 60, lon0 = -77.0, sp1 = 39.0 + 27.0 / 60, sp2 = 38.0 + 18.0 / 60,
        fe = 400000.0, fn = 0.0))
    case 2248 => // NAD83 / Maryland (ftUS) — same cone, ftUS axes
      Some(Lcc2Sp(lat0 = 37.0 + 40.0 / 60, lon0 = -77.0, sp1 = 39.0 + 27.0 / 60, sp2 = 38.0 + 18.0 / 60,
        fe = 400000.0 / FtUs, fn = 0.0, unit = FtUs))
    case 21781 | 2056 => // CH1903 / LV03 and CH1903+ / LV95 (Swiss grids):
      // Helmert (swisstopo GRANIT87 translations, CH1903->WGS84 negated) +
      // Hotine Oblique Mercator variant B through Bern at azimuth 90
      Some(DatumProjected(
        Helmert(tx = -674.374, ty = -15.056, tz = -405.346,
          rxSec = 0, rySec = 0, rzSec = 0, sPpm = 0, aDst = BESSEL_A, fDst = BESSEL_F),
        HotineOM(latC = 46.0 + 57.0 / 60 + 8.66 / 3600,
          lonC = 7.0 + 26.0 / 60 + 22.50 / 3600, alphaC = 90.0, gammaC = 90.0,
          k0 = 1.0, fe = if (code == 2056) 2600000.0 else 600000.0,
          fn = if (code == 2056) 1200000.0 else 200000.0, variantB = true,
          a = BESSEL_A, flattening = BESSEL_F)))
    case 5514 => // S-JTSK / Krovak East North (Czech Republic + Slovakia)
      Some(DatumProjected(
        Helmert(tx = -589.0, ty = -76.0, tz = -480.0,
          rxSec = 0, rySec = 0, rzSec = 0, sPpm = 0, aDst = BESSEL_A, fDst = BESSEL_F),
        Krovak(latC = 49.5, lonO = 24.0 + 50.0 / 60,
          alphaC = 30.0 + 17.0 / 60 + 17.3031 / 3600, latP1 = 78.5, kP = 0.9999,
          fe = 0.0, fn = 0.0, eastNorth = true)))
    case 54032 => // ESRI:54032 World Azimuthal Equidistant (spherical on R = a)
      Some(AzimuthalEquidistant(lat0 = 0.0, lon0 = 0.0))
    case 29101 => // SAD69 / Brazil Polyconic (GRS67 modified, published SAD69 shift)
      Some(DatumProjected(
        Helmert(tx = 66.87, ty = -4.37, tz = 38.52,
          rxSec = 0, rySec = 0, rzSec = 0, sPpm = 0,
          aDst = 6378160.0, fDst = 1.0 / 298.25),
        Polyconic(lat0 = 0.0, lon0 = -54.0, fe = 5000000.0, fn = 10000000.0,
          a = 6378160.0, flattening = 1.0 / 298.25)))
    case 4087 | 32662 => // WGS 84 / World Equidistant Cylindrical & Plate Carrée
      Some(EquidistantCyl(lat1 = 0.0, lat0 = 0.0, lon0 = 0.0, fe = 0.0, fn = 0.0))
    case 3435 => // NAD83 / Illinois East (ftUS) — TM
      Some(Tm(lat0 = 36.0 + 40.0 / 60, lonCm = -(88.0 + 20.0 / 60), k0 = 0.999975,
        fe = 300000.0 / FtUs, fn = 0.0, unit = FtUs))
    case 27200 => // NZGD49 / New Zealand Map Grid: Helmert (EPSG 1564
      // NZGD49->WGS84 position-vector set, negated) + the NZMG polynomial
      Some(DatumProjected(
        Helmert(tx = -59.47, ty = 5.04, tz = -187.44,
          rxSec = 0.47, rySec = -0.10, rzSec = 1.024, sPpm = 4.5993,
          aDst = INTL_A, fDst = INTL_F),
        Nzmg()))
    case 29701 | 29702 => // Tananarive (Paris) / Laborde Grid (29701) and its
      // Greenwich-referenced sibling (29702): 3-param Tananarive 1925 shift
      // (EPSG 1227, negated) + Laborde at 21 grads S / 49 grads E-of-Paris,
      // azimuth 21 grads, k0 0.9995 on International 1924
      Some(DatumProjected(
        Helmert(tx = 189.0, ty = 242.0, tz = 91.0,
          rxSec = 0, rySec = 0, rzSec = 0, sPpm = 0, aDst = INTL_A, fDst = INTL_F),
        LabordeOM(latC = -18.9, lonC = 44.1 + (2.0 + 20.0 / 60 + 14.025 / 3600),
          azimuthDeg = 18.9, k0 = 0.9995, fe = 400000.0, fn = 800000.0)))
    case _ => None
  }

  /** Canonical WKT1 for the most-exported geographic/web codes, so file
    * writers can put real WKT in a .prj instead of the "EPSG:n" label
    * (the reference writes WKT through pyogrio). Strings are the public
    * EPSG registry definitions in their classic WKT1 form. */
  def wellKnownWkt(code: Int): Option[String] = code match {
    case 4326 => Some("""GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]""")
    case 4269 => Some("""GEOGCS["NAD83",DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4269"]]""")
    case 4258 => Some("""GEOGCS["ETRS89",DATUM["European_Terrestrial_Reference_System_1989",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4258"]]""")
    case 3857 => Some("""PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]],PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],PARAMETER["scale_factor",1],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3857"]]""")
    case _ => None
  }

  /** The text a .prj sidecar should carry for a CRS label: WKT passes
    * through; an EPSG-coded label upgrades to its canonical WKT when
    * known, else the label itself (still recoverable by [[normalizeOpt]]). */
  def prjText(crs: String): String = {
    val t = crs.trim
    val up = t.toUpperCase
    if (up.startsWith("PROJCS") || up.startsWith("GEOGCS") || up.startsWith("PROJCRS") ||
        up.startsWith("GEOGCRS") || up.startsWith("COMPD_CS") || t.startsWith("{")) t
    else normalizeOpt(t).flatMap(wellKnownWkt).getOrElse(t)
  }

  /** Compose two to-geographic transforms into src -> dst. */
  def compose(src: CrsTransform, dst: CrsTransform): CrsTransform = new CrsTransform {
    def forward(x: Double, y: Double): (Double, Double) = {
      val (lon, lat) = src.inverse(x, y)
      dst.forward(lon, lat)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (lon, lat) = dst.inverse(x, y)
      src.forward(lon, lat)
    }
  }

  /** Transform from one EPSG code to another via 4326 as the hub. */
  def chain(from: Int, to: Int): CrsTransform = {
    if (from == to) return Identity
    def to4326(code: Int): CrsTransform = forEpsg(code).getOrElse(
      throw new IllegalArgumentException(
        s"Unsupported CRS EPSG:$code — supported: 4326, 4258, 4277, 3857, 3395, " +
          "UTM 326xx/327xx/269xx/258xx, MGA 283xx, 27700, 28992, 2154, 2193, 2263, " +
          "2248, 3435, 5070, 26985, 27200 (NZMG), 29701/29702 (Laborde), " +
          "3413, 3031, 3976, 6933, 3035, 8857, 32661/32761 " +
          "(UPS), 54008/54009/54012/54017 (ESRI World Sinusoidal/Mollweide/" +
          "Eckert IV/Behrmann), or any " +
          "LCC/TM/Albers/Mercator CRS given as WKT/PROJJSON with its projection " +
          "parameters"))
    compose(to4326(from), to4326(to))
  }

  /** Resolve a CRS string (EPSG code, WKT1/WKT2, PROJJSON) to a transform
    * to/from its geographic base: the EPSG registry first, then the
    * parameter-driven [[ProjParse]] path for full definitions. */
  def resolveToWgs84(crs: String): Option[CrsTransform] =
    normalizeOpt(crs).flatMap(forEpsg).orElse(ProjParse.parse(crs))

  /** String-keyed [[chain]]: either side may be an EPSG code or a full
    * WKT/PROJJSON definition whose parameters we parse. */
  def chainStr(from: String, to: String): CrsTransform = {
    def resolve(c: String): CrsTransform = resolveToWgs84(c).getOrElse(
      throw new IllegalArgumentException(
        s"Cannot resolve CRS '${c.take(120)}' — not a supported EPSG code and not a " +
          "parseable projected/geographic WKT or PROJJSON definition"))
    compose(resolve(from), resolve(to))
  }

  /** UTM zone estimation from lon/lat center (ref `array.py:1190-1276`;
    * `datumName` as in the reference: WGS 84 → 326xx/327xx, NAD83 → 269xx
    * — NAD83 UTM is defined for northern zones only). */
  def estimateUtmEpsg(lon: Double, lat: Double, datumName: String = "WGS 84"): Int = {
    val zone = math.min(60, math.max(1, (math.floor((lon + 180) / 6) + 1).toInt))
    datumName.toUpperCase.replace(" ", "") match {
      case "NAD83" =>
        require(lat >= 0, "NAD83 UTM zones are defined for the northern hemisphere only")
        26900 + zone
      case _ => if (lat >= 0) 32600 + zone else 32700 + zone
    }
  }
}
