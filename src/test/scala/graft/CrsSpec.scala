package graft

import graft.functions.{Crs, Geometry}
import graft.functions.Geometry.{GPoint, Pt, transform}
import org.scalatest.funsuite.AnyFunSuite

/** The closed-form CRS registry: forward/inverse round-trips, the
  * published Ordnance Survey Transverse-Mercator worked example, and
  * the defining invariant of each projection family (conformal scale
  * at standard parallels, equal-area preservation, true scale at the
  * polar standard parallel).
  */
class CrsSpec extends AnyFunSuite {

  private def pt(x: Double, y: Double, srid: Int) =
    GPoint(Some(Pt(x, y)), srid)
  private def xy(g: Geometry.Geom): Pt =
    g.asInstanceOf[GPoint].pt.get

  // ellipsoidal surface helpers for the invariant checks
  private def radii(e: Crs.Ellipsoid, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg); val sp = math.sin(phi)
    val w = math.sqrt(1 - e.e2 * sp * sp)
    (e.a * (1 - e.e2) / (w * w * w), e.a / w) // (M meridional, N normal)
  }

  test("every registry CRS round-trips through WGS84 to sub-mm") {
    // (srid, in-domain lon/lat probe points)
    val probes: Seq[(Int, Seq[(Double, Double)])] = Seq(
      3857 -> Seq((5.0, 52.0), (-120.0, -33.0)),
      32631 -> Seq((3.0, 48.0), (0.5, 60.0)),
      32733 -> Seq((15.0, -12.0)),
      25832 -> Seq((9.0, 51.0)),
      26917 -> Seq((-81.0, 35.0)),
      28355 -> Seq((147.0, -37.0)),
      2154 -> Seq((2.35, 48.85), (5.0, 43.3), (-1.5, 47.2)),
      2157 -> Seq((-8.0, 53.5), (-6.26, 53.35)),
      27700 -> Seq((-0.13, 51.51), (-3.19, 55.95), (-5.93, 54.6)),
      3035 -> Seq((10.0, 52.0), (25.0, 60.0), (-8.0, 40.0)),
      5070 -> Seq((-96.0, 23.0), (-120.0, 47.0), (-75.0, 40.0)),
      3577 -> Seq((132.0, -25.0), (151.0, -33.9)),
      3413 -> Seq((-45.0, 75.0), (10.0, 80.0)),
      3976 -> Seq((0.0, -75.0), (170.0, -78.0)),
      32661 -> Seq((0.0, 85.0), (-120.0, 87.0)),
      32761 -> Seq((45.0, -85.0)),
      2193 -> Seq((174.78, -41.29), (172.64, -43.53), (174.76, -36.85)),
      32118 -> Seq((-73.99, 40.71), (-72.9, 40.85)),
      26985 -> Seq((-76.61, 39.29), (-77.04, 38.9)),
      32139 -> Seq((-97.74, 30.27), (-98.49, 29.42)),
      26929 -> Seq((-86.3, 32.38), (-85.39, 31.22)),
      2056 -> Seq((8.54, 47.38), (7.44, 46.95), (6.14, 46.2)),
      21781 -> Seq((8.54, 47.38), (9.84, 46.5)))
    for ((srid, pts) <- probes; (lon, lat) <- pts) {
      val projected = transform(pt(lon, lat, 4326), srid)
      assert(projected.srid == srid)
      val back = xy(transform(projected, 4326))
      // 1e-8 deg ≈ 1 mm ground distance
      assert(math.abs(back.x - lon) < 1e-7 &&
        math.abs(back.y - lat) < 1e-7,
        s"EPSG:$srid round-trip ($lon,$lat) -> (${back.x},${back.y})")
    }
  }

  test("Swiss Oblique Cylindrical: centre, offsets, and a city check") {
    import graft.functions.Crs
    val lv95 = Crs.projectionOf(2056).get
    val lv03 = Crs.projectionOf(21781).get
    // the projection centre (Bern old observatory) maps to the false
    // origin EXACTLY in both frames
    val cLon = 7.0 + 26.0 / 60 + 22.5 / 3600
    val cLat = 46.0 + 57.0 / 60 + 8.66 / 3600
    val c95 = lv95.forward(Pt(cLon, cLat))
    assert(math.abs(c95.x - 2600000.0) < 1e-6 &&
      math.abs(c95.y - 1200000.0) < 1e-6, s"LV95 centre $c95")
    // LV95 = LV03 + (2 000 000, 1 000 000) by construction, everywhere
    val z95 = lv95.forward(Pt(8.54, 47.38))
    val z03 = lv03.forward(Pt(8.54, 47.38))
    assert(math.abs(z95.x - z03.x - 2000000.0) < 1e-6 &&
      math.abs(z95.y - z03.y - 1000000.0) < 1e-6)
    // Zurich lands in the right part of the LV03 grid (sanity against
    // gross formula/sign errors; the projection itself is pinned by
    // the exact-centre and round-trip checks)
    assert(math.abs(z03.x - 683000.0) < 3000 &&
      math.abs(z03.y - 248000.0) < 3000, s"Zurich LV03 $z03")
    // conformal: scale at the centre is 1 (numeric derivative, both
    // axes agree to 1e-6)
    val d = 1e-6
    val dx = lv95.forward(Pt(cLon + d, cLat))
    val dy = lv95.forward(Pt(cLon, cLat + d))
    val (m, n) = radii(Crs.Bessel1841, cLat)
    val kx = math.hypot(dx.x - c95.x, dx.y - c95.y) /
      (math.toRadians(d) * n * math.cos(math.toRadians(cLat)))
    val ky = math.hypot(dy.x - c95.x, dy.y - c95.y) /
      (math.toRadians(d) * m)
    assert(math.abs(kx - 1.0) < 1e-5 && math.abs(ky - 1.0) < 1e-5,
      s"centre scale ($kx, $ky)")
  }

  test("NZTM and state-plane zones hold their defining invariants") {
    import graft.functions.Crs
    // NZTM: central-meridian scale is k0 = 0.9996 (TM invariant)
    val nz = Crs.projectionOf(2193).get
    val p0 = nz.forward(Pt(173.0, -41.0))
    val p1 = nz.forward(Pt(173.0, -41.0 + 1e-6))
    val (m, _) = radii(Crs.Grs80, -41.0)
    val k = math.hypot(p1.x - p0.x, p1.y - p0.y) /
      (math.toRadians(1e-6) * m)
    assert(math.abs(k - 0.9996) < 1e-5, s"NZTM CM scale $k")
    assert(math.abs(p0.x - 1600000.0) < 1e-6, "CM at false easting")
    // LCC state planes: scale 1 on both standard parallels
    for ((srid, lon0, sps) <- Seq(
        (32118, -74.0, Seq(41.0 + 2.0 / 60, 40.0 + 40.0 / 60)),
        (26985, -77.0, Seq(39.45, 38.3)),
        (32139, -98.5, Seq(31.0 + 53.0 / 60, 30.0 + 7.0 / 60)));
        sp <- sps) {
      val pr = Crs.projectionOf(srid).get
      val a = pr.forward(Pt(lon0, sp))
      val b = pr.forward(Pt(lon0 + 1e-6, sp))
      val (_, nR) = radii(Crs.Grs80, sp)
      val kSp = math.hypot(b.x - a.x, b.y - a.y) /
        (math.toRadians(1e-6) * nR * math.cos(math.toRadians(sp)))
      assert(math.abs(kSp - 1.0) < 1e-5, s"EPSG:$srid k($sp) = $kSp")
    }
  }

  test("OS worked example: Airy TM forward matches published E/N to mm") {
    // "A guide to coordinate systems in Great Britain" (Ordnance
    // Survey), worked TM example: OSGB36 geographic
    // 52°39'27.2531"N 1°43'4.5177"E -> E 651409.903 N 313177.270.
    // Projection-only (input is already OSGB36), so this pins the
    // generalized Krüger TM on a non-WGS84 ellipsoid independently of
    // the Helmert step.
    val lat = 52 + 39.0 / 60 + 27.2531 / 3600
    val lon = 1 + 43.0 / 60 + 4.5177 / 3600
    val proj = Crs.projectionOf(27700).get
    val en = proj.forward(Pt(lon, lat))
    assert(math.abs(en.x - 651409.903) < 2e-3, s"E ${en.x}")
    assert(math.abs(en.y - 313177.270) < 2e-3, s"N ${en.y}")
  }

  test("27700 full chain matches the OS worked example within Helmert accuracy") {
    // The OS guide's companion worked example gives the SAME point in
    // ETRS89 (≈WGS84): 52°39'28.8282"N 1°42'57.7880"E. The full
    // WGS84 → Helmert → Airy-TM chain must land within the documented
    // single-Helmert accuracy (±5 m vs the OSTN grid truth) of
    // E 651409.903 N 313177.270.
    val lat = 52 + 39.0 / 60 + 28.8282 / 3600
    val lon = 1 + 42.0 / 60 + 57.7880 / 3600
    val en = xy(transform(pt(lon, lat, 4326), 27700))
    val err = math.hypot(en.x - 651409.903, en.y - 313177.270)
    assert(err < 6.0, s"got (${en.x}, ${en.y}), off by $err m")
  }

  test("Lambert-93 holds scale 1 on its standard parallels") {
    val proj = Crs.projectionOf(2154).get
    for (sp <- Seq(44.0, 49.0)) {
      val dlon = 1e-4
      val p1 = proj.forward(Pt(3.0, sp))
      val p2 = proj.forward(Pt(3.0 + dlon, sp))
      val projected = math.hypot(p2.x - p1.x, p2.y - p1.y)
      val (_, nu) = radii(Crs.Grs80, sp)
      val ground = nu * math.cos(math.toRadians(sp)) * math.toRadians(dlon)
      assert(math.abs(projected / ground - 1.0) < 1e-7,
        s"scale at $sp = ${projected / ground}")
    }
    // Paris city hall is near (652000, 6862000) on Lambert-93
    val paris = proj.forward(Pt(2.3522, 48.8566))
    assert(math.abs(paris.x - 652000) < 3000 &&
      math.abs(paris.y - 6862000) < 3000, s"got $paris")
  }

  test("Albers and LAEA preserve area on the ellipsoid") {
    // a 0.1° x 0.1° quad's projected area must equal its ellipsoidal
    // surface area: dA = M·N·cosφ dφ dλ (midpoint rule is 1e-6 exact
    // at this size)
    def quadArea(proj: Crs.Projection, lon: Double, lat: Double,
        d: Double): Double = {
      val c = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d),
        (lon, lat + d)).map { case (x, y) => proj.forward(Pt(x, y)) }
      math.abs((0 until 4).map { i =>
        val a = c(i); val b = c((i + 1) % 4)
        a.x * b.y - b.x * a.y
      }.sum / 2)
    }
    for ((srid, lon, lat) <- Seq((5070, -100.0, 40.0), (3577, 140.0, -30.0),
        (3035, 10.0, 52.0))) {
      val proj = Crs.projectionOf(srid).get
      val d = 0.1
      val (mRad, nRad) = radii(Crs.Grs80, lat + d / 2)
      val ellip = mRad * nRad * math.cos(math.toRadians(lat + d / 2)) *
        math.toRadians(d) * math.toRadians(d)
      val ratio = quadArea(proj, lon, lat, d) / ellip
      assert(math.abs(ratio - 1.0) < 1e-5, s"EPSG:$srid area ratio $ratio")
    }
  }

  test("polar stereographic: true scale at latTs, UPS pole constants") {
    val proj = Crs.projectionOf(3413).get
    // scale along a parallel at the standard parallel 70N = 1
    val dlon = 1e-4
    val p1 = proj.forward(Pt(10.0, 70.0))
    val p2 = proj.forward(Pt(10.0 + dlon, 70.0))
    val projected = math.hypot(p2.x - p1.x, p2.y - p1.y)
    val (_, nu) = radii(Crs.Wgs84, 70.0)
    val ground = nu * math.cos(math.toRadians(70.0)) * math.toRadians(dlon)
    assert(math.abs(projected / ground - 1.0) < 1e-7)
    // UPS: the pole maps exactly to the false origin
    val ups = Crs.projectionOf(32661).get
    val pole = ups.forward(Pt(0.0, 90.0))
    assert(math.abs(pole.x - 2e6) < 1e-6 && math.abs(pole.y - 2e6) < 1e-6)
    // south aspects round-trip with correct sign
    val s = Crs.projectionOf(3976).get
    val back = s.inverse(s.forward(Pt(100.0, -80.0)))
    assert(math.abs(back.x - 100.0) < 1e-9 &&
      math.abs(back.y - -80.0) < 1e-9)
  }

  test("datum-equivalent UTM aliases match WGS84 UTM to sub-mm") {
    // ETRS89/UTM32N vs WGS84/UTM32N and NAD83/UTM17N vs WGS84/UTM17N:
    // the GRS80-vs-WGS84 flattening difference is sub-0.1 mm
    val p = pt(9.0, 51.0, 4326)
    val etrs = xy(transform(p, 25832)); val wgs = xy(transform(p, 32632))
    assert(math.hypot(etrs.x - wgs.x, etrs.y - wgs.y) < 1e-3)
    val p2 = pt(-81.0, 35.0, 4326)
    val nad = xy(transform(p2, 26917)); val w2 = xy(transform(p2, 32617))
    assert(math.hypot(nad.x - w2.x, nad.y - w2.y) < 1e-3)
  }

  test("Hotine omerc matches the EPSG worked example (Timbalai RSO Borneo)") {
    // EPSG Guidance Note 7-2 §Hotine variant B worked example:
    // Timbalai 1948 / RSO Borneo (m), Everest 1830 (1967 definition)
    val rso = "+proj=omerc +lat_0=4 " +
      s"+lonc=115 +alpha=${53.0 + 18.0 / 60 + 56.9537 / 3600} " +
      s"+gamma=${53.0 + 7.0 / 60 + 48.3685 / 3600} +k=0.99984 " +
      "+x_0=590476.87 +y_0=442857.65 +ellps=evrstSS"
    val crs = Crs.parseProj(rso)
    val proj = crs.asInstanceOf[Crs.Projected].proj
    val lon = 115.0 + 48.0 / 60 + 19.8196 / 3600
    val lat = 5.0 + 23.0 / 60 + 14.1129 / 3600
    val p = proj.forward(Pt(lon, lat))
    assert(math.abs(p.x - 679245.73) < 0.05, s"E=${p.x}")
    assert(math.abs(p.y - 596562.78) < 0.05, s"N=${p.y}")
    // inverse round-trips the worked example to sub-mm in degrees
    val back = proj.inverse(p)
    assert(math.abs(back.x - lon) < 1e-8 && math.abs(back.y - lat) < 1e-8)
  }

  test("registerCustom: Hotine zone round-trips and is conformal") {
    val rso = "+proj=omerc +lat_0=4 +lonc=115 " +
      s"+alpha=${53.0 + 18.0 / 60 + 56.9537 / 3600} " +
      s"+gamma=${53.0 + 7.0 / 60 + 48.3685 / 3600} +k=0.99984 " +
      "+x_0=590476.87 +y_0=442857.65 +ellps=evrstSS " +
      "+towgs84=-679,669,-48"
    Crs.registerCustom(29873, rso)
    try {
      // st_transform now resolves the zone end-to-end
      val g = transform(pt(115.5, 4.5, 4326), 29873)
      val b = xy(transform(g, 4326))
      assert(math.abs(b.x - 115.5) < 1e-6 && math.abs(b.y - 4.5) < 1e-6)
      // conformality: local scale isotropy h ≈ k at in-domain points
      val proj = Crs.projectionOf(29873).get
      val ell = Crs.Ellipsoid(6377298.556, 300.8017)
      for ((lon, lat) <- Seq((114.0, 2.0), (116.5, 6.0), (115.0, 4.0))) {
        val (mM, nN) = radii(ell, lat)
        val d = 1e-6
        val p0 = proj.forward(Pt(lon, lat))
        val pE = proj.forward(Pt(lon + d, lat))
        val pN = proj.forward(Pt(lon, lat + d))
        val dr = math.toRadians(d)
        val kLon = math.hypot(pE.x - p0.x, pE.y - p0.y) /
          (nN * math.cos(math.toRadians(lat)) * dr)
        val kLat = math.hypot(pN.x - p0.x, pN.y - p0.y) / (mM * dr)
        assert(math.abs(kLon / kLat - 1.0) < 1e-4,
          s"anisotropy at ($lon,$lat): $kLon vs $kLat")
        // scale on the initial line stays near kc
        assert(kLon > 0.9997 && kLon < 1.0008, s"scale $kLon")
      }
    } finally Crs.unregisterCustom(29873)
    // unregistered again: refusal is restored
    intercept[UnsupportedOperationException] {
      transform(pt(115.5, 4.5, 4326), 29873)
    }
  }

  test("graft.crs.<srid> property registers a zone lazily per-JVM") {
    System.setProperty("graft.crs.906901",
      "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=500000 +ellps=GRS80")
    try {
      val b = xy(transform(transform(pt(9.5, 48.0, 4326), 906901), 4326))
      assert(math.abs(b.x - 9.5) < 1e-7 && math.abs(b.y - 48.0) < 1e-7)
      // matches the equivalent built-in ETRS89 / UTM32N to sub-mm
      val custom = xy(transform(pt(9.5, 48.0, 4326), 906901))
      val utm = xy(transform(pt(9.5, 48.0, 4326), 25832))
      assert(math.abs(custom.x - utm.x) < 1e-3 &&
        math.abs(custom.y - utm.y) < 1e-3)
    } finally {
      System.clearProperty("graft.crs.906901")
      Crs.unregisterCustom(906901)
    }
  }

  test("unknown CRS still refuses loudly, both directions") {
    intercept[UnsupportedOperationException] {
      transform(pt(1.0, 1.0, 4326), 999999)
    }
    intercept[UnsupportedOperationException] {
      transform(pt(1.0, 1.0, 4326).withSrid(999999), 4326)
    }
  }
}
