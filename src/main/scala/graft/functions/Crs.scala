package graft.functions

import graft.functions.Geometry.Pt

/** Closed-form CRS registry backing `st_transform` — no PROJ, no grid
  * files, every projection from published formulas (Snyder, "Map
  * Projections: A Working Manual", USGS PP 1395; EPSG Guidance Note 7
  * part 2) and every parameter from the public EPSG registry. The
  * reference reaches the same surface through PROJ
  * (pg_lake_engine/src/pgduck/shippable_spatial_functions.c).
  *
  * Covered (beyond the original 4326 / 3857 / WGS84-UTM set):
  *  - ETRS89, NAD83, GDA94 geographic + UTM/MGA zone aliases — these
  *    datums are WGS84-equivalent at the sub-meter level, the same
  *    null-transform PROJ applies without datum grids;
  *  - EPSG:2154 Lambert-93 (LCC 2SP, GRS80), EPSG:2157 Irish TM,
  *    EPSG:3035 LAEA Europe, EPSG:5070 CONUS Albers, EPSG:3577
  *    Australian Albers;
  *  - EPSG:27700 British National Grid: Transverse Mercator on Airy
  *    1830 plus the published 7-parameter Helmert shift WGS84→OSGB36
  *    (±2-5 m vs the OSTN15 grid truth — identical posture to PostGIS
  *    with towgs84 and no grid file);
  *  - EPSG:3413 / 3976 NSIDC polar stereographic, EPSG:32661 / 32761
  *    UPS.
  *
  * Every CRS pivots through WGS84 geographic: `toWgs` = inverse
  * projection then datum shift to WGS84; `fromWgs` the reverse.
  */
private[graft] object Crs {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
    val n: Double = f / (2 - f)
  }
  val Wgs84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val Grs80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)

  // ---- datums ------------------------------------------------------

  sealed trait Datum {
    def ell: Ellipsoid
    /** datum geographic (lon/lat deg) → WGS84 geographic */
    def toWgs84(p: Pt): Pt
    def fromWgs84(p: Pt): Pt
  }

  /** Frames realized to agree with WGS84 at the sub-meter level
    * (ETRS89, NAD83, GDA94, RGF93): the standard no-grid null shift.
    */
  final case class WgsEquivalent(ell: Ellipsoid) extends Datum {
    def toWgs84(p: Pt): Pt = p
    def fromWgs84(p: Pt): Pt = p
  }

  /** 7-parameter Helmert (position-vector convention, EPSG method
    * 9606): `t*` meters, `r*` arc-seconds, `ppm` scale. Parameters
    * define WGS84 → this datum; the inverse uses negated parameters
    * (mm-level, standard practice).
    */
  final case class Helmert7(ell: Ellipsoid, tx: Double, ty: Double,
      tz: Double, rxSec: Double, rySec: Double, rzSec: Double,
      ppm: Double) extends Datum {

    private def geodToGeoc(e: Ellipsoid, p: Pt): (Double, Double, Double) = {
      val phi = math.toRadians(p.y); val lam = math.toRadians(p.x)
      val sp = math.sin(phi)
      val nu = e.a / math.sqrt(1 - e.e2 * sp * sp)
      (nu * math.cos(phi) * math.cos(lam),
        nu * math.cos(phi) * math.sin(lam),
        nu * (1 - e.e2) * sp)
    }

    private def geocToGeod(e: Ellipsoid,
        x: Double, y: Double, z: Double): Pt = {
      val p = math.hypot(x, y)
      var phi = math.atan2(z, p * (1 - e.e2))
      var i = 0
      while (i < 8) {
        val sp = math.sin(phi)
        val nu = e.a / math.sqrt(1 - e.e2 * sp * sp)
        phi = math.atan2(z + e.e2 * nu * sp, p)
        i += 1
      }
      Pt(math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
    }

    private def apply7(sgn: Double, x: Double, y: Double, z: Double)
        : (Double, Double, Double) = {
      val s = 1.0 + sgn * ppm * 1e-6
      val rx = sgn * math.toRadians(rxSec / 3600.0)
      val ry = sgn * math.toRadians(rySec / 3600.0)
      val rz = sgn * math.toRadians(rzSec / 3600.0)
      (sgn * tx + s * (x - rz * y + ry * z),
        sgn * ty + s * (rz * x + y - rx * z),
        sgn * tz + s * (-ry * x + rx * y + z))
    }

    def fromWgs84(p: Pt): Pt = {
      val (x, y, z) = geodToGeoc(Wgs84, p)
      val (x2, y2, z2) = apply7(1.0, x, y, z)
      geocToGeod(ell, x2, y2, z2)
    }

    def toWgs84(p: Pt): Pt = {
      val (x, y, z) = geodToGeoc(ell, p)
      val (x2, y2, z2) = apply7(-1.0, x, y, z)
      geocToGeod(Wgs84, x2, y2, z2)
    }
  }

  val Osgb36: Datum = Helmert7(Airy1830,
    tx = -446.448, ty = 125.157, tz = -542.060,
    rxSec = -0.1502, rySec = -0.2470, rzSec = -0.8421, ppm = 20.4894)

  val Bessel1841: Ellipsoid = Ellipsoid(6377397.155, 299.1528128)

  /** CH1903+ (LV95 frame): translation-only Helmert, the published
    * towgs84 = (674.374, 15.056, 405.346) negated to the WGS84→datum
    * convention used here.
    */
  val Ch1903Plus: Datum = Helmert7(Bessel1841,
    tx = -674.374, ty = -15.056, tz = -405.346,
    rxSec = 0, rySec = 0, rzSec = 0, ppm = 0)

  /** CH1903 (LV03 frame): towgs84 = (674.4, 15.1, 405.3), negated. */
  val Ch1903: Datum = Helmert7(Bessel1841,
    tx = -674.4, ty = -15.1, tz = -405.3,
    rxSec = 0, rySec = 0, rzSec = 0, ppm = 0)

  // ---- projections -------------------------------------------------

  sealed trait Projection {
    /** lon/lat degrees (on the projection's datum) → easting/northing */
    def forward(ll: Pt): Pt
    def inverse(xy: Pt): Pt
  }

  /** Spherical web mercator (EPSG:3857's defining formulas). */
  case object WebMercator extends Projection {
    private val R = 6378137.0
    def forward(ll: Pt): Pt = Pt(
      R * math.toRadians(ll.x),
      R * math.log(math.tan(math.Pi / 4 + math.toRadians(ll.y) / 2)))
    def inverse(xy: Pt): Pt = Pt(
      math.toDegrees(xy.x / R),
      math.toDegrees(2 * math.atan(math.exp(xy.y / R)) - math.Pi / 2))
  }

  @inline private def atanh(x: Double): Double =
    0.5 * math.log((1 + x) / (1 - x))
  @inline private def asinh(x: Double): Double =
    math.log(x + math.sqrt(x * x + 1))

  /** Transverse Mercator via the 6th-order Krüger series (Karney,
    * "Transverse Mercator with an accuracy of a few nanometers",
    * J. Geodesy 85, 2011) — generalized over ellipsoid, scale, origin
    * latitude (meridian-arc offset), and false easting/northing.
    */
  final case class TMerc(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double) extends Projection {
    private val n = ell.n
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    private val A = ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val alpha: Array[Double] = Array(
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 -
        127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 +
        281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 +
        167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
    private val beta: Array[Double] = Array(
      n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 -
        81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 +
        46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 +
        5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)
    private val delta: Array[Double] = Array(
      2 * n - 2.0 / 3 * n2 - 2 * n3 + 116.0 / 45 * n4 +
        26.0 / 45 * n5 - 2854.0 / 675 * n6,
      7.0 / 3 * n2 - 8.0 / 5 * n3 - 227.0 / 45 * n4 +
        2704.0 / 315 * n5 + 2323.0 / 945 * n6,
      56.0 / 15 * n3 - 136.0 / 35 * n4 - 1262.0 / 105 * n5 +
        73814.0 / 2835 * n6,
      4279.0 / 630 * n4 - 332.0 / 35 * n5 - 399572.0 / 14175 * n6,
      4174.0 / 315 * n5 - 144838.0 / 6237 * n6,
      601676.0 / 22275 * n6)

    private def xiEta(latDeg: Double, dlDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dl = math.toRadians(dlDeg)
      val sp = math.sin(phi)
      val c = 2 * math.sqrt(n) / (1 + n)
      val t = math.sinh(atanh(sp) - c * atanh(c * sp))
      val xiP = math.atan2(t, math.cos(dl))
      val etaP = asinh(math.sin(dl) / math.sqrt(t * t +
        math.cos(dl) * math.cos(dl)))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 6) {
        xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
        j += 1
      }
      (xi, eta)
    }

    /** meridian arc from the equator to lat0, via the same series */
    private val m0: Double =
      if (lat0Deg == 0.0) 0.0 else A * xiEta(lat0Deg, 0.0)._1

    def forward(ll: Pt): Pt = {
      val (xi, eta) = xiEta(ll.y, ll.x - lon0Deg)
      Pt(fe + k0 * A * eta, fn + k0 * (A * xi - m0))
    }

    def inverse(xy: Pt): Pt = {
      val xi = (xy.y - fn + k0 * m0) / (k0 * A)
      val eta = (xy.x - fe) / (k0 * A)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 6) {
        xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      var phi = chi
      j = 1
      while (j <= 6) { phi += delta(j - 1) * math.sin(2 * j * chi); j += 1 }
      Pt(lon0Deg + math.toDegrees(
        math.atan2(math.sinh(etaP), math.cos(xiP))),
        math.toDegrees(phi))
    }
  }

  // shared ellipsoidal helpers (Snyder's m, t, q)
  @inline private def mOf(e: Ellipsoid, phi: Double): Double =
    math.cos(phi) / math.sqrt(1 - e.e2 * math.sin(phi) * math.sin(phi))
  @inline private def tOf(e: Ellipsoid, phi: Double): Double = {
    val sp = math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - e.e * sp) / (1 + e.e * sp), e.e / 2)
  }
  @inline private def qOf(e: Ellipsoid, phi: Double): Double = {
    val sp = math.sin(phi)
    (1 - e.e2) * (sp / (1 - e.e2 * sp * sp) -
      (1 / (2 * e.e)) * math.log((1 - e.e * sp) / (1 + e.e * sp)))
  }
  /** φ from isometric t by fixed-point iteration (Snyder 7-9). */
  private def phiFromT(e: Ellipsoid, t: Double): Double = {
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    while (i < 15) {
      val sp = math.sin(phi)
      phi = math.Pi / 2 - 2 * math.atan(t *
        math.pow((1 - e.e * sp) / (1 + e.e * sp), e.e / 2))
      i += 1
    }
    phi
  }
  /** φ from authalic q by Newton-ish iteration (Snyder 3-16). */
  private def phiFromQ(e: Ellipsoid, q: Double): Double = {
    var phi = math.asin(math.max(-1, math.min(1, q / 2)))
    var i = 0
    while (i < 15) {
      val sp = math.sin(phi)
      val one = 1 - e.e2 * sp * sp
      phi += one * one / (2 * math.cos(phi)) * (q / (1 - e.e2) -
        sp / one + (1 / (2 * e.e)) *
          math.log((1 - e.e * sp) / (1 + e.e * sp)))
      i += 1
    }
    phi
  }

  /** Lambert Conformal Conic, 2 standard parallels (Snyder 15-1..15-11). */
  final case class Lcc2Sp(ell: Ellipsoid, lat0: Double, lon0: Double,
      sp1: Double, sp2: Double, fe: Double, fn: Double) extends Projection {
    private val p1 = math.toRadians(sp1); private val p2 = math.toRadians(sp2)
    private val nC =
      (math.log(mOf(ell, p1)) - math.log(mOf(ell, p2))) /
        (math.log(tOf(ell, p1)) - math.log(tOf(ell, p2)))
    private val fF = mOf(ell, p1) / (nC * math.pow(tOf(ell, p1), nC))
    private val rho0 =
      ell.a * fF * math.pow(tOf(ell, math.toRadians(lat0)), nC)

    def forward(ll: Pt): Pt = {
      val rho = ell.a * fF * math.pow(tOf(ell, math.toRadians(ll.y)), nC)
      val th = nC * math.toRadians(ll.x - lon0)
      Pt(fe + rho * math.sin(th), fn + rho0 - rho * math.cos(th))
    }

    def inverse(xy: Pt): Pt = {
      val x = xy.x - fe; val y = rho0 - (xy.y - fn)
      val sgn = if (nC >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(x, y)
      val th = math.atan2(sgn * x, sgn * y)
      val t = math.pow(rho / (ell.a * fF), 1 / nC)
      Pt(lon0 + math.toDegrees(th / nC),
        math.toDegrees(phiFromT(ell, t)))
    }
  }

  /** Albers Equal-Area Conic, 2 standard parallels (Snyder 14-1..14-21). */
  final case class Albers(ell: Ellipsoid, lat0: Double, lon0: Double,
      sp1: Double, sp2: Double, fe: Double, fn: Double) extends Projection {
    private val p1 = math.toRadians(sp1); private val p2 = math.toRadians(sp2)
    private val m1 = mOf(ell, p1); private val m2 = mOf(ell, p2)
    private val q1 = qOf(ell, p1); private val q2 = qOf(ell, p2)
    private val nC = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val cC = m1 * m1 + nC * q1
    private val rho0 =
      ell.a * math.sqrt(cC - nC * qOf(ell, math.toRadians(lat0))) / nC

    def forward(ll: Pt): Pt = {
      val rho = ell.a *
        math.sqrt(cC - nC * qOf(ell, math.toRadians(ll.y))) / nC
      val th = nC * math.toRadians(ll.x - lon0)
      Pt(fe + rho * math.sin(th), fn + rho0 - rho * math.cos(th))
    }

    def inverse(xy: Pt): Pt = {
      val x = xy.x - fe; val y = rho0 - (xy.y - fn)
      val sgn = if (nC >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(x, y)
      val th = math.atan2(sgn * x, sgn * y)
      val q = (cC - rho * rho * nC * nC / (ell.a * ell.a)) / nC
      Pt(lon0 + math.toDegrees(th / nC),
        math.toDegrees(phiFromQ(ell, q)))
    }
  }

  /** Lambert Azimuthal Equal-Area, oblique ellipsoidal aspect
    * (Snyder 24-2..24-31 / 3-11..3-12).
    */
  final case class Laea(ell: Ellipsoid, lat0: Double, lon0: Double,
      fe: Double, fn: Double) extends Projection {
    private val qp = qOf(ell, math.Pi / 2)
    private val rq = ell.a * math.sqrt(qp / 2)
    private val phi0 = math.toRadians(lat0)
    private val beta1 = math.asin(qOf(ell, phi0) / qp)
    private val d = ell.a * mOf(ell, phi0) / (rq * math.cos(beta1))

    def forward(ll: Pt): Pt = {
      val beta = math.asin(qOf(ell, math.toRadians(ll.y)) / qp)
      val dl = math.toRadians(ll.x - lon0)
      val b = rq * math.sqrt(2 / (1 + math.sin(beta1) * math.sin(beta) +
        math.cos(beta1) * math.cos(beta) * math.cos(dl)))
      Pt(fe + b * d * math.cos(beta) * math.sin(dl),
        fn + (b / d) * (math.cos(beta1) * math.sin(beta) -
          math.sin(beta1) * math.cos(beta) * math.cos(dl)))
    }

    def inverse(xy: Pt): Pt = {
      val x = (xy.x - fe) / d; val y = d * (xy.y - fn)
      val rho = math.hypot(x, y)
      if (rho == 0) return Pt(lon0, lat0)
      val ce = 2 * math.asin(rho / (2 * rq))
      val q = qp * (math.cos(ce) * math.sin(beta1) +
        y * math.sin(ce) * math.cos(beta1) / rho)
      val lam = math.atan2(x * math.sin(ce),
        rho * math.cos(beta1) * math.cos(ce) -
          y * math.sin(beta1) * math.sin(ce))
      Pt(lon0 + math.toDegrees(lam), math.toDegrees(phiFromQ(ell, q)))
    }
  }

  /** Polar Stereographic (EPSG 9829/9810): variant B when `latTs` is a
    * true-scale parallel, variant A when `k0` is given at the pole.
    * `south = true` flips the aspect.
    */
  final case class PolarStereo(ell: Ellipsoid, latTs: Double,
      lon0: Double, k0: Double, south: Boolean, fe: Double, fn: Double)
      extends Projection {
    // ρ = rhoFactor · t(|φ|)
    private val rhoFactor: Double = {
      val ts = math.toRadians(math.abs(latTs))
      if (math.abs(latTs) >= 89.999)
        2 * ell.a * k0 / math.sqrt(
          math.pow(1 + ell.e, 1 + ell.e) * math.pow(1 - ell.e, 1 - ell.e))
      else ell.a * mOf(ell, ts) / tOf(ell, ts)
    }

    def forward(ll: Pt): Pt = {
      val lat = if (south) -ll.y else ll.y
      val dl = math.toRadians(if (south) -(ll.x - lon0) else ll.x - lon0)
      val rho = rhoFactor * tOf(ell, math.toRadians(lat))
      val x = rho * math.sin(dl)
      val yN = -rho * math.cos(dl)
      Pt(fe + (if (south) -x else x), fn + (if (south) -yN else yN))
    }

    def inverse(xy: Pt): Pt = {
      val x0 = xy.x - fe; val y0 = xy.y - fn
      val (x, y) = if (south) (-x0, -y0) else (x0, y0)
      val rho = math.hypot(x, y)
      val phiAbs =
        if (rho == 0) math.Pi / 2 else phiFromT(ell, rho / rhoFactor)
      val dl = if (rho == 0) 0.0 else math.atan2(x, -y)
      val lon = normLon(
        lon0 + (if (south) -math.toDegrees(dl) else math.toDegrees(dl)))
      Pt(lon, if (south) -math.toDegrees(phiAbs) else math.toDegrees(phiAbs))
    }
  }

  /** Swiss Oblique Cylindrical (EPSG method 9814 — the CH1903/LV03 and
    * CH1903+/LV95 projection; EPSG Guidance Note 7-2 formulas): a
    * double projection — conformal sphere at the projection centre,
    * then an oblique equatorial Mercator on that sphere. The oblique
    * member of the projection registry (Hotine variants share the
    * rotated-sphere machinery but their published zone azimuths are
    * not reproducible here without the EPSG database, so they stay
    * refused rather than approximated).
    */
  final case class SwissOblique(ell: Ellipsoid, latc: Double,
      lonc: Double, fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(latc)
    private val lam0 = math.toRadians(lonc)
    private val e = ell.e
    private val c2 = ell.e2 / (1 - ell.e2)
    private val alphaC =
      math.sqrt(1 + c2 * math.pow(math.cos(phi0), 4))
    private val b0 = math.asin(math.sin(phi0) / alphaC)
    private val kC =
      math.log(math.tan(math.Pi / 4 + b0 / 2)) -
        alphaC * math.log(math.tan(math.Pi / 4 + phi0 / 2)) +
        alphaC * e / 2 *
          math.log((1 + e * math.sin(phi0)) / (1 - e * math.sin(phi0)))
    private val bigR =
      ell.a * math.sqrt(1 - ell.e2) / (1 - ell.e2 * math.sin(phi0) *
        math.sin(phi0))

    def forward(ll: Pt): Pt = {
      val phi = math.toRadians(ll.y)
      val sPar = alphaC * math.log(math.tan(math.Pi / 4 + phi / 2)) -
        alphaC * e / 2 *
          math.log((1 + e * math.sin(phi)) / (1 - e * math.sin(phi))) + kC
      val b = 2 * (math.atan(math.exp(sPar)) - math.Pi / 4)
      val l = alphaC * (math.toRadians(ll.x) - lam0)
      // rotate the conformal sphere so the centre (b0, 0) lands on the
      // pseudo-equator origin: unit-vector rotation about the y-axis
      // (pole-safe atan2 form of the guidance note's tan expressions)
      val bBar = math.asin(math.cos(b0) * math.sin(b) -
        math.sin(b0) * math.cos(b) * math.cos(l))
      val lBar = math.atan2(math.cos(b) * math.sin(l),
        math.cos(b0) * math.cos(b) * math.cos(l) +
          math.sin(b0) * math.sin(b))
      Pt(fe + bigR * lBar,
        fn + bigR / 2 *
          math.log((1 + math.sin(bBar)) / (1 - math.sin(bBar))))
    }

    def inverse(xy: Pt): Pt = {
      val lBar = (xy.x - fe) / bigR
      val bBar = 2 * (math.atan(math.exp((xy.y - fn) / bigR)) - math.Pi / 4)
      val b = math.asin(math.cos(b0) * math.sin(bBar) +
        math.sin(b0) * math.cos(bBar) * math.cos(lBar))
      val l = math.atan2(math.cos(bBar) * math.sin(lBar),
        math.cos(b0) * math.cos(bBar) * math.cos(lBar) -
          math.sin(b0) * math.sin(bBar))
      val lam = lam0 + l / alphaC
      // Newton fixed point for phi from the conformal latitude b
      var phi = b
      var i = 0
      while (i < 20) {
        val sPar = (math.log(math.tan(math.Pi / 4 + b / 2)) - kC) / alphaC +
          e * math.log(math.tan(math.Pi / 4 +
            math.asin(e * math.sin(phi)) / 2))
        phi = 2 * math.atan(math.exp(sPar)) - math.Pi / 2
        i += 1
      }
      Pt(math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Hotine Oblique Mercator (EPSG methods 9812 "variant A" /
    * 9815 "variant B"; EPSG Guidance Note 7-2 formulas, Snyder
    * pp. 66-75). The initial line runs at azimuth `alphaDeg` through
    * the projection centre; `gammaDeg` is the rectified-to-skew
    * angle (defaults to the azimuth in published zones). Variant B
    * (`noUoff = false`, PROJ's plain `+proj=omerc`) references false
    * easting/northing to the projection CENTRE; variant A
    * (`+no_uoff`) to the aposphere's natural origin.
    *
    * Unlike the fixed registry entries, Hotine zones carry their
    * constants in the EPSG database — so this projection is reached
    * through [[registerCustom]] with caller-supplied constants
    * rather than a baked-in SRID table.
    */
  final case class Omerc(ell: Ellipsoid, latc: Double, lonc: Double,
      alphaDeg: Double, gammaDeg: Double, k: Double, fe: Double,
      fn: Double, noUoff: Boolean) extends Projection {
    private val e = ell.e
    private val e2 = ell.e2
    private val phiC = math.toRadians(latc)
    private val lamC = math.toRadians(lonc)
    private val alC = math.toRadians(alphaDeg)
    private val gaC = math.toRadians(gammaDeg)
    private val sgn = if (phiC < 0) -1.0 else 1.0
    private val cosPhiC = math.cos(phiC)
    private val sinPhiC = math.sin(phiC)
    private val bB =
      math.sqrt(1 + e2 * math.pow(cosPhiC, 4) / (1 - e2))
    private val aA = ell.a * bB * k * math.sqrt(1 - e2) /
      (1 - e2 * sinPhiC * sinPhiC)
    private val t0 = tOf(ell, phiC)
    private val dD = bB * math.sqrt(1 - e2) /
      (cosPhiC * math.sqrt(1 - e2 * sinPhiC * sinPhiC))
    private val dD2 = math.max(dD * dD, 1.0)
    private val fF = dD + math.sqrt(dD2 - 1.0) * sgn
    private val hH = fF * math.pow(t0, bB)
    private val gG = (fF - 1.0 / fF) / 2.0
    private val ga0 = math.asin(math.sin(alC) / dD)
    private val lam0 = lamC - math.asin(gG * math.tan(ga0)) / bB
    /** centre offset along the initial line (variant B only) */
    private val uc =
      if (noUoff) 0.0
      else if (math.abs(alphaDeg) == 90.0) aA * (lamC - lam0)
      else aA / bB * math.atan2(math.sqrt(dD2 - 1.0), math.cos(alC)) * sgn

    def forward(ll: Pt): Pt = {
      val phi = math.toRadians(ll.y)
      val t = tOf(ell, phi)
      val q = hH / math.pow(t, bB)
      val s = (q - 1.0 / q) / 2.0
      val tt = (q + 1.0 / q) / 2.0
      val dl = bB * (math.toRadians(ll.x) - lam0)
      val v = math.sin(dl)
      val u = (-v * math.cos(ga0) + s * math.sin(ga0)) / tt
      val vv = aA * math.log((1 - u) / (1 + u)) / (2.0 * bB)
      val uu = aA * math.atan2(
        s * math.cos(ga0) + v * math.sin(ga0), math.cos(dl)) / bB -
        math.abs(uc) * sgn
      Pt(vv * math.cos(gaC) + uu * math.sin(gaC) + fe,
        uu * math.cos(gaC) - vv * math.sin(gaC) + fn)
    }

    def inverse(xy: Pt): Pt = {
      val vv = (xy.x - fe) * math.cos(gaC) - (xy.y - fn) * math.sin(gaC)
      val uu = (xy.y - fn) * math.cos(gaC) +
        (xy.x - fe) * math.sin(gaC) + math.abs(uc) * sgn
      val q = math.exp(-bB * vv / aA)
      val s = (q - 1.0 / q) / 2.0
      val tt = (q + 1.0 / q) / 2.0
      val v = math.sin(bB * uu / aA)
      val u = (v * math.cos(ga0) + s * math.sin(ga0)) / tt
      val t = math.pow(hH / math.sqrt((1 + u) / (1 - u)), 1.0 / bB)
      val phi = phiFromT(ell, t)
      val lam = lam0 - math.atan2(
        s * math.cos(ga0) - v * math.sin(ga0),
        math.cos(bB * uu / aA)) / bB
      Pt(normLon(math.toDegrees(lam)), math.toDegrees(phi))
    }
  }

  /** Normalize a longitude into (-180, 180] — projections whose
    * central meridian is far from Greenwich (polar stereographic at
    * lon0 = -45) otherwise hand back lon0 ± 180-relative values.
    */
  @inline private def normLon(lon: Double): Double =
    if (lon > 180) lon - 360 else if (lon <= -180) lon + 360 else lon

  // ---- CRS = projection + datum ------------------------------------

  sealed trait Crs {
    def toWgs(p: Pt): Pt
    def fromWgs(p: Pt): Pt
  }
  final case class Geographic(datum: Datum) extends Crs {
    def toWgs(p: Pt): Pt = datum.toWgs84(p)
    def fromWgs(p: Pt): Pt = datum.fromWgs84(p)
  }
  final case class Projected(proj: Projection, datum: Datum) extends Crs {
    def toWgs(p: Pt): Pt = datum.toWgs84(proj.inverse(p))
    def fromWgs(p: Pt): Pt = proj.forward(datum.fromWgs84(p))
  }

  private def utm(zone: Int, north: Boolean, ell: Ellipsoid): Projected =
    Projected(TMerc(ell, 0.0, zone * 6.0 - 183.0, 0.9996, 500000.0,
      if (north) 0.0 else 1e7), WgsEquivalent(ell))

  /** Projection-only accessor for tests (datum-frame coordinates in,
    * projected coordinates out).
    */
  private[graft] def projectionOf(srid: Int): Option[Projection] =
    forSrid(srid).collect { case Projected(p, _) => p }

  // ---- caller-parameterized registrations --------------------------

  private val custom =
    new java.util.concurrent.ConcurrentHashMap[Int, Crs]()

  /** Register a caller-supplied CRS under `srid` from PROJ-string-style
    * constants — the escape hatch for any projection whose zone
    * parameters live in the EPSG database rather than this registry
    * (Hotine RSO zones, exotic national grids). Supported `+proj`
    * values: longlat, tmerc, utm, lcc (2SP), aea, laea, stere
    * (polar), somerc, omerc; ellipsoid via `+ellps` (WGS84, GRS80,
    * airy, bessel, intl, clrk66, krass, evrst30, evrstSS) or explicit
    * `+a`/`+rf`; datum via `+towgs84` (3- or 7-parameter, the
    * published datum→WGS84 convention — negated internally).
    *
    * The registry is per-JVM. On a multi-executor cluster, either
    * call this from executor-side init (a SparkPlugin), or set the
    * system property `graft.crs.<srid>` to the PROJ string in the
    * executor JVM options — [[forSrid]] lazily parses it in whichever
    * JVM first needs the zone, so driver and executors resolve
    * identically with no state shipping.
    */
  def registerCustom(srid: Int, projString: String): Unit =
    custom.put(srid, parseProj(projString))

  private[graft] def unregisterCustom(srid: Int): Unit =
    custom.remove(srid)

  private def customFor(srid: Int): Option[Crs] =
    Option(custom.get(srid)).orElse(
      sys.props.get(s"graft.crs.$srid").map { ps =>
        val c = parseProj(ps)
        custom.putIfAbsent(srid, c)
        c
      })

  /** PROJ-string parser for [[registerCustom]] — constants only, no
    * grids, no EPSG lookups.
    */
  private[graft] def parseProj(s: String): Crs = {
    val kv: Map[String, String] = s.trim.split("\\s+").toSeq
      .filter(_.startsWith("+")).map(_.stripPrefix("+")).map { tok =>
        tok.split("=", 2) match {
          case Array(k) => k -> ""
          case Array(k, v) => k -> v
        }
      }.toMap
    def d(k: String, default: Double = 0.0): Double =
      kv.get(k).map(_.toDouble).getOrElse(default)
    val ell = kv.get("ellps").map {
      case "WGS84" => Wgs84
      case "GRS80" => Grs80
      case "airy" => Airy1830
      case "bessel" => Bessel1841
      case "intl" => Ellipsoid(6378388.0, 297.0)
      case "clrk66" => Ellipsoid(6378206.4, 294.9786982)
      case "krass" => Ellipsoid(6378245.0, 298.3)
      case "evrst30" => Ellipsoid(6377276.345, 300.8017)
      case "evrstSS" => Ellipsoid(6377298.556, 300.8017)
      case other => throw new IllegalArgumentException(
        s"unknown +ellps=$other (pass +a=/+rf= instead)")
    }.getOrElse {
      if (kv.contains("a") && kv.contains("rf")) Ellipsoid(d("a"), d("rf"))
      else Wgs84
    }
    val datum: Datum = kv.get("towgs84").map { t =>
      val p = t.split(",").map(_.trim.toDouble).padTo(7, 0.0)
      // PROJ's towgs84 is datum→WGS84; Helmert7 here applies
      // WGS84→datum, so the position-vector parameters negate
      Helmert7(ell, -p(0), -p(1), -p(2), -p(3), -p(4), -p(5), -p(6))
    }.getOrElse(WgsEquivalent(ell))
    val fe = d("x_0"); val fn = d("y_0")
    val k0 = kv.get("k").orElse(kv.get("k_0")).map(_.toDouble)
      .getOrElse(1.0)
    kv.getOrElse("proj", "") match {
      case "longlat" => Geographic(datum)
      case "tmerc" => Projected(
        TMerc(ell, d("lat_0"), d("lon_0"), k0, fe, fn), datum)
      case "utm" =>
        val z = kv.getOrElse("zone",
          throw new IllegalArgumentException("+proj=utm needs +zone")).toInt
        Projected(TMerc(ell, 0.0, z * 6.0 - 183.0, 0.9996, 500000.0,
          if (kv.contains("south")) 1e7 else 0.0), datum)
      case "lcc" =>
        require(kv.contains("lat_1"), "+proj=lcc needs +lat_1 (2SP form)")
        Projected(Lcc2Sp(ell, d("lat_0"), d("lon_0"), d("lat_1"),
          d("lat_2", d("lat_1")), fe, fn), datum)
      case "aea" => Projected(
        Albers(ell, d("lat_0"), d("lon_0"), d("lat_1"), d("lat_2"),
          fe, fn), datum)
      case "laea" => Projected(
        Laea(ell, d("lat_0"), d("lon_0"), fe, fn), datum)
      case "stere" =>
        val lat0 = d("lat_0")
        require(math.abs(lat0) == 90.0,
          "+proj=stere: only the polar aspect is supported")
        Projected(PolarStereo(ell, d("lat_ts", lat0), d("lon_0"), k0,
          south = lat0 < 0, fe, fn), datum)
      case "somerc" => Projected(
        SwissOblique(ell, d("lat_0"), d("lon_0"), fe, fn), datum)
      case "omerc" =>
        val alpha = d("alpha", 90.0)
        Projected(Omerc(ell, d("lat_0"), d("lonc", d("lon_0")), alpha,
          d("gamma", alpha), k0, fe, fn,
          noUoff = kv.contains("no_uoff") || kv.contains("no_off")),
          datum)
      case other => throw new IllegalArgumentException(
        s"unsupported +proj=$other (supported: longlat tmerc utm lcc " +
          "aea laea stere somerc omerc)")
    }
  }

  def forSrid(srid: Int): Option[Crs] =
    customFor(srid).orElse(builtinFor(srid))

  private def builtinFor(srid: Int): Option[Crs] = {
    val wgsGeo = Geographic(WgsEquivalent(Wgs84))
    srid match {
      case 4326 => Some(wgsGeo)
      // WGS84-equivalent geographic frames (null shift, no grids)
      case 4258 | 4269 | 4283 | 4171 => Some(wgsGeo)
      case 3857 => Some(Projected(WebMercator, WgsEquivalent(Wgs84)))
      // WGS84 UTM
      case s if s >= 32601 && s <= 32660 => Some(utm(s - 32600, north = true, Wgs84))
      case s if s >= 32701 && s <= 32760 => Some(utm(s - 32700, north = false, Wgs84))
      // ETRS89 UTM 28N-38N
      case s if s >= 25828 && s <= 25838 => Some(utm(s - 25800, north = true, Grs80))
      // NAD83 UTM 1N-23N
      case s if s >= 26901 && s <= 26923 => Some(utm(s - 26900, north = true, Grs80))
      // GDA94 MGA zones 48-58 (southern hemisphere)
      case s if s >= 28348 && s <= 28358 => Some(utm(s - 28300, north = false, Grs80))
      // France: RGF93 / Lambert-93
      case 2154 => Some(Projected(
        Lcc2Sp(Grs80, 46.5, 3.0, 49.0, 44.0, 700000.0, 6600000.0),
        WgsEquivalent(Grs80)))
      // Ireland: IRENET95 / Irish Transverse Mercator
      case 2157 => Some(Projected(
        TMerc(Grs80, 53.5, -8.0, 0.99982, 600000.0, 750000.0),
        WgsEquivalent(Grs80)))
      // Great Britain: OSGB36 / British National Grid (Helmert datum)
      case 27700 => Some(Projected(
        TMerc(Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0),
        Osgb36))
      // Europe: ETRS89-extended / LAEA
      case 3035 => Some(Projected(
        Laea(Grs80, 52.0, 10.0, 4321000.0, 3210000.0),
        WgsEquivalent(Grs80)))
      // CONUS: NAD83 / Conus Albers
      case 5070 => Some(Projected(
        Albers(Grs80, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0),
        WgsEquivalent(Grs80)))
      // Australia: GDA94 / Australian Albers
      case 3577 => Some(Projected(
        Albers(Grs80, 0.0, 132.0, -18.0, -36.0, 0.0, 0.0),
        WgsEquivalent(Grs80)))
      // NSIDC Sea Ice Polar Stereographic North / South
      case 3413 => Some(Projected(
        PolarStereo(Wgs84, 70.0, -45.0, 1.0, south = false, 0.0, 0.0),
        WgsEquivalent(Wgs84)))
      case 3976 => Some(Projected(
        PolarStereo(Wgs84, -70.0, 0.0, 1.0, south = true, 0.0, 0.0),
        WgsEquivalent(Wgs84)))
      // Universal Polar Stereographic
      case 32661 => Some(Projected(
        PolarStereo(Wgs84, 90.0, 0.0, 0.994, south = false, 2e6, 2e6),
        WgsEquivalent(Wgs84)))
      case 32761 => Some(Projected(
        PolarStereo(Wgs84, -90.0, 0.0, 0.994, south = true, 2e6, 2e6),
        WgsEquivalent(Wgs84)))
      // New Zealand: NZGD2000 geographic + NZTM2000
      case 4167 => Some(wgsGeo)
      case 2193 => Some(Projected(
        TMerc(Grs80, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0),
        WgsEquivalent(Grs80)))
      // US State Plane (metric NAD83 zones; the two projection
      // families every SPCS zone except Alaska-1 uses)
      // NY Long Island: LCC 2SP
      case 32118 => Some(Projected(
        Lcc2Sp(Grs80, 40.0 + 10.0 / 60, -74.0,
          41.0 + 2.0 / 60, 40.0 + 40.0 / 60, 300000.0, 0.0),
        WgsEquivalent(Grs80)))
      // Maryland: LCC 2SP
      case 26985 => Some(Projected(
        Lcc2Sp(Grs80, 37.0 + 40.0 / 60, -77.0,
          39.45, 38.3, 400000.0, 0.0),
        WgsEquivalent(Grs80)))
      // Texas Central: LCC 2SP
      case 32139 => Some(Projected(
        Lcc2Sp(Grs80, 29.0 + 40.0 / 60, -98.5,
          31.0 + 53.0 / 60, 30.0 + 7.0 / 60, 700000.0, 3000000.0),
        WgsEquivalent(Grs80)))
      // Alabama East: TM
      case 26929 => Some(Projected(
        TMerc(Grs80, 30.5, -85.0 - 50.0 / 60, 0.99996, 200000.0, 0.0),
        WgsEquivalent(Grs80)))
      // Switzerland: CH1903+/LV95 and CH1903/LV03 (Swiss Oblique
      // Cylindrical on Bessel 1841, Bern-centred)
      case 2056 => Some(Projected(
        SwissOblique(Bessel1841, 46.0 + 57.0 / 60 + 8.66 / 3600,
          7.0 + 26.0 / 60 + 22.5 / 3600, 2600000.0, 1200000.0),
        Ch1903Plus))
      case 21781 => Some(Projected(
        SwissOblique(Bessel1841, 46.0 + 57.0 / 60 + 8.66 / 3600,
          7.0 + 26.0 / 60 + 22.5 / 3600, 600000.0, 200000.0),
        Ch1903))
      case _ => None
    }
  }
}
