package graft

import graft.functions.Geometry
import graft.functions.Geometry._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the geometry core: serialization roundtrips and
  * DE-9IM predicate algebra over randomly generated valid figures with
  * integer coordinates (where every sign test is exact IEEE).
  */
class GeometryPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val coord = Gen.choose(0, 20).map(_.toDouble)
  private val genPoint: Gen[Geom] = for {
    x <- coord; y <- coord
  } yield GPoint(Some(Pt(x, y)))

  private val genLine: Gen[Geom] = for {
    n <- Gen.choose(2, 5)
    pts <- Gen.listOfN(n, for { x <- coord; y <- coord } yield Pt(x, y))
    if pts.distinct.length >= 2
  } yield GLine(pts.foldLeft(Vector.empty[Pt]) { (acc, p) =>
    if (acc.nonEmpty && acc.last == p) acc else acc :+ p })

  private val genRect: Gen[Geom] = for {
    x <- Gen.choose(0, 15); y <- Gen.choose(0, 15)
    w <- Gen.choose(1, 5); h <- Gen.choose(1, 5)
  } yield {
    val (x0, y0, x1, y1) = (x.toDouble, y.toDouble,
      (x + w).toDouble, (y + h).toDouble)
    GPolygon(Vector(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1),
      Pt(x0, y1), Pt(x0, y0))))
  }

  private val genTriangle: Gen[Geom] = (for {
    a <- Gen.zip(coord, coord); b <- Gen.zip(coord, coord)
    c <- Gen.zip(coord, coord)
  } yield (Pt(a._1, a._2), Pt(b._1, b._2), Pt(c._1, c._2)))
    .suchThat { case (a, b, c) =>
      (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) != 0 }
    .map { case (a, b, c) => GPolygon(Vector(Vector(a, b, c, a))) }

  private val genGeom: Gen[Geom] =
    Gen.oneOf(genPoint, genLine, genRect, genTriangle)
  private val genArea: Gen[Geom] = Gen.oneOf(genRect, genTriangle)

  test("wkt and wkb roundtrips are lossless") {
    check(forAll(genGeom) { g =>
      parseWkt(toWkt(g)) == g && parseWkb(toWkb(g)) == g
    })
  }

  test("geojson roundtrip is lossless") {
    check(forAll(genGeom) { g =>
      graft.sources.GeoJson.parseGeometryString(toGeoJson(g)) == g
    })
  }

  test("predicate algebra: symmetry, implication, exclusivity") {
    check(forAll(genGeom, genGeom) { (a, b) =>
      val sym = Geometry.touches(a, b) == Geometry.touches(b, a) &&
        Geometry.overlaps(a, b) == Geometry.overlaps(b, a) &&
        Geometry.crosses(a, b) == Geometry.crosses(b, a) &&
        intersects(a, b) == intersects(b, a)
      val impl = (!contains(a, b) || covers(a, b)) && // contains ⇒ covers
        (!containsProperly(a, b) || contains(a, b)) && // proper ⇒ contains
        (!Geometry.touches(a, b) || intersects(a, b)) && // touches ⇒ meet
        (disjoint(a, b) == !intersects(a, b))
      // touches means no interior overlap, so it excludes overlaps
      val excl = !(Geometry.touches(a, b) && Geometry.overlaps(a, b))
      sym && impl && excl
    })
  }

  test("envelope covers its geometry; normalize is idempotent") {
    check(forAll(genArea) { g =>
      covers(envelope(g), g) &&
        normalize(normalize(g)) == normalize(g)
    })
  }

  test("convex clip result stays inside clipper and subject") {
    check(forAll(genArea, genRect) { (subject, clip) =>
      val inter = intersectionWithConvex(subject, clip)
      isEmpty(inter) || {
        // every vertex of the clipped result is in (or on) both inputs
        allPoints(inter).forall { p =>
          val pt = GPoint(Some(p))
          // float intersection points can sit off the exact boundary
          // by an ulp; accept covered-or-within-epsilon on both sides
          (covers(clip, pt) || distance(clip, pt) < 1e-9) &&
            (covers(subject, pt) || distance(subject, pt) < 1e-9)
        }
      }
    })
  }

  // ---- general (non-convex) overlay: Greiner–Hormann ----------------

  import graft.functions.Overlay

  private def lShape(ox: Double, oy: Double, w: Double, w1: Double,
      h1: Double, h2: Double): Geom =
    GPolygon(Vector(Vector(
      Pt(ox, oy), Pt(ox + w, oy), Pt(ox + w, oy + h1),
      Pt(ox + w1, oy + h1), Pt(ox + w1, oy + h2), Pt(ox, oy + h2),
      Pt(ox, oy))))

  /** Random non-convex L at integer coordinates. */
  private val genL: Gen[Geom] = for {
    w <- Gen.choose(3, 8); w1 <- Gen.choose(1, 2)
    h1 <- Gen.choose(1, 3); up <- Gen.choose(1, 4)
    ox <- Gen.choose(0, 6); oy <- Gen.choose(0, 6)
  } yield lShape(ox, oy, w, w1, h1, h1 + up)

  /** Random box at half-integer coordinates — generic position vs the
    * integer Ls, so the overlay never sees degenerate contact.
    */
  private val genHalfBox: Gen[Geom] = for {
    x <- Gen.choose(0, 12); y <- Gen.choose(0, 12)
    w <- Gen.choose(1, 6); h <- Gen.choose(1, 6)
  } yield GPolygon(Vector(Vector(
    Pt(x + 0.5, y + 0.5), Pt(x + w + 0.5, y + 0.5),
    Pt(x + w + 0.5, y + h + 0.5), Pt(x + 0.5, y + h + 0.5),
    Pt(x + 0.5, y + 0.5))))

  /** Random non-convex L at half-integer coordinates. */
  private val genHalfL: Gen[Geom] = genL.map {
    case GPolygon(rs, s) =>
      GPolygon(rs.map(_.map(p => Pt(p.x + 0.5, p.y + 0.5))), s)
    case g => g
  }

  private def near(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("overlay area algebra on non-convex polygons") {
    check(forAll(genL, Gen.oneOf(genHalfBox, genHalfL)) { (a, b) =>
      val ia = area(Overlay.overlayPolygons(a, b, Overlay.Inter))
      val ua = area(Overlay.overlayPolygons(a, b, Overlay.Union))
      val da = area(Overlay.overlayPolygons(a, b, Overlay.Diff))
      val db = area(Overlay.overlayPolygons(b, a, Overlay.Diff))
      near(ia + da, area(a)) &&
        near(ia + db, area(b)) &&
        near(ua, area(a) + area(b) - ia) &&
        near(area(Overlay.overlayPolygons(b, a, Overlay.Inter)), ia) &&
        near(area(Overlay.overlayPolygons(b, a, Overlay.Union)), ua)
    })
  }

  test("overlay known figures: L against L, containment, hole") {
    val a = lShape(0, 0, 6, 2, 2, 6)        // area 20
    val b = lShape(0.5, 0.5, 6, 2, 2, 6)    // non-convex ∩ non-convex
    assert(near(area(a), 20.0) && near(area(b), 20.0))
    assert(near(area(Overlay.overlayPolygons(a, b, Overlay.Inter)), 14.25))
    assert(near(area(Overlay.overlayPolygons(a, b, Overlay.Union)), 25.75))
    assert(near(area(Overlay.overlayPolygons(a, b, Overlay.Diff)), 5.75))

    // box strictly inside the L's foot: difference keeps it as a hole
    val hole = GPolygon(Vector(Vector(
      Pt(2.5, 0.5), Pt(3.5, 0.5), Pt(3.5, 1.5), Pt(2.5, 1.5),
      Pt(2.5, 0.5))))
    val diff = Overlay.overlayPolygons(a, hole, Overlay.Diff)
    assert(near(area(diff), 19.0))
    assert(locateInPolygon(
      diff.asInstanceOf[GPolygon].rings, Pt(3.0, 1.0)) == 0)
    assert(near(area(Overlay.overlayPolygons(a, hole, Overlay.Union)), 20.0))
    assert(near(area(Overlay.overlayPolygons(a, hole, Overlay.Inter)), 1.0))

    // disjoint: union is both pieces, intersection empty
    val far = GPolygon(Vector(Vector(
      Pt(50.5, 50.5), Pt(51.5, 50.5), Pt(51.5, 51.5), Pt(50.5, 51.5),
      Pt(50.5, 50.5))))
    assert(isEmpty(Overlay.overlayPolygons(a, far, Overlay.Inter)))
    assert(near(area(Overlay.overlayPolygons(a, far, Overlay.Union)), 21.0))
    assert(near(area(Overlay.overlayPolygons(a, far, Overlay.Diff)), 20.0))

    // degenerate contact: a zero-area INTERSECTION (pure shared edge)
    // resolves to the 1-dimensional contact, like GEOS
    val touching = GPolygon(Vector(Vector(
      Pt(6, 0), Pt(8, 0), Pt(8, 2), Pt(6, 2), Pt(6, 0))))
    val ti = Overlay.overlayPolygons(a, touching, Overlay.Inter)
    assert(ti.isInstanceOf[GLine] &&
      near(Geometry.length(ti), 2.0), toWkt(ti))
    val tu = Overlay.overlayPolygons(a, touching, Overlay.Union)
    assert(near(area(tu), 24.0) && tu.isInstanceOf[GPolygon])
    assert(near(area(Overlay.overlayPolygons(a, touching, Overlay.Diff)),
      20.0))
  }

  test("noded overlay: touching and shared-edge figures") {
    def box(x1: Double, y1: Double, x2: Double, y2: Double) =
      GPolygon(Vector(Vector(Pt(x1, y1), Pt(x2, y1), Pt(x2, y2),
        Pt(x1, y2), Pt(x1, y1))))
    // corner-only contact: union is a MULTIPOLYGON of both squares
    val q1 = box(0, 0, 2, 2); val q2 = box(2, 2, 4, 4)
    val cu = Overlay.overlayPolygons(q1, q2, Overlay.Union)
    assert(cu.isInstanceOf[GMultiPolygon] && near(area(cu), 8.0))
    assert(near(area(Overlay.overlayPolygons(q1, q2, Overlay.Diff)), 4.0))
    // point contact: the 0-dimensional touch point, like GEOS
    val ci = Overlay.overlayPolygons(q1, q2, Overlay.Inter)
    assert(toWkt(ci) == "POINT(2 2)", toWkt(ci))
    // partial shared edge: union merges into one ring
    val r1 = box(0, 0, 3, 3); val r2 = box(3, 1, 5, 2)
    val pu = Overlay.overlayPolygons(r1, r2, Overlay.Union)
    assert(pu.isInstanceOf[GPolygon] && near(area(pu), 11.0))
    assert(near(area(Overlay.overlayPolygons(r1, r2, Overlay.Diff)), 9.0))
    // identical polygons: every op is closed-form
    assert(near(area(Overlay.overlayPolygons(r1, r1, Overlay.Inter)), 9.0))
    assert(near(area(Overlay.overlayPolygons(r1, r1, Overlay.Union)), 9.0))
    assert(isEmpty(Overlay.overlayPolygons(r1, r1, Overlay.Diff)))
    // contained sharing two edges (corner notch): diff is the L
    val notch = box(0, 0, 1, 1)
    assert(near(area(Overlay.overlayPolygons(r1, notch, Overlay.Inter)), 1.0))
    assert(near(area(Overlay.overlayPolygons(r1, notch, Overlay.Union)), 9.0))
    val ln = Overlay.overlayPolygons(r1, notch, Overlay.Diff)
    assert(near(area(ln), 8.0) && ln.isInstanceOf[GPolygon])
    // overlap with vertex-on-edge contact plus proper crossings
    val cross1 = box(1, -1, 2, 4) // spans r1 vertically, corners on edges
    assert(near(area(Overlay.overlayPolygons(r1, cross1, Overlay.Inter)), 3.0))
    assert(near(area(Overlay.overlayPolygons(r1, cross1, Overlay.Union)),
      9.0 + 5.0 - 3.0))
    assert(near(area(Overlay.overlayPolygons(r1, cross1, Overlay.Diff)), 6.0))
  }

  test("buffer fallback: u-turns and tight joints via capsule union") {
    // exact u-turn: the backtrack leg is absorbed — the union of the
    // two capsules IS the first capsule, closed form
    val ut = Overlay.buffer(GLine(Vector(Pt(0, 0), Pt(4, 0), Pt(1, 0))), 1.0)
    assert(near(area(ut), 2.0 * 4 + 16 * math.sin(math.Pi / 16)))
    // radius too large for the inner joints of a tight square wave:
    // direct outline refuses, capsule union still answers
    val sq = Overlay.buffer(GLine(Vector(
      Pt(0, 0), Pt(2, 0), Pt(2, 1), Pt(0, 1))), 1.0)
    val capArea = 2.0 * 2 + 16 * math.sin(math.Pi / 16) // 2-long capsule
    assert(area(sq) > capArea && area(sq) <
      2 * capArea + (2.0 * 1 + 16 * math.sin(math.Pi / 16)))
    // tight reflex joint on a polygon ring: fallback = ring ∪ capsules
    val poly = GPolygon(Vector(Vector(
      Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(2, 1), Pt(0, 4), Pt(0, 0))))
    val pb = Overlay.buffer(poly, 2.0)
    assert(area(pb) > area(poly))
    // every original vertex sits strictly inside the buffered shape
    assert(Vector(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(2, 1), Pt(0, 4))
      .forall(p => graft.functions.Geometry.intersects(
        GPoint(Some(p)), pb)))
  }

  test("noded overlay: polygons with holes") {
    def ring(pts: (Double, Double)*) =
      pts.map { case (x, y) => Pt(x, y) }.toVector
    val A = GPolygon(Vector(
      ring((0, 0), (6, 0), (6, 6), (0, 6), (0, 0)),
      ring((2, 2), (4, 2), (4, 4), (2, 4), (2, 2)))) // hole, area 32
    assert(near(area(A), 32.0))
    // overlaps solid AND pokes into the hole (proper crossings with
    // both rings)
    val B = GPolygon(Vector(ring((1, 1), (3, 1), (3, 3), (1, 3), (1, 1))))
    assert(near(area(Overlay.overlayPolygons(A, B, Overlay.Inter)), 3.0))
    val u = Overlay.overlayPolygons(A, B, Overlay.Union)
    assert(near(area(u), 33.0)) // hole shrinks to an L of area 3
    assert(near(area(Overlay.overlayPolygons(A, B, Overlay.Diff)), 29.0))
    assert(near(area(Overlay.overlayPolygons(B, A, Overlay.Diff)), 1.0))
    // B sharing the hole's bottom edge exactly, from the solid side
    val C = GPolygon(Vector(ring((2, 1), (4, 1), (4, 2), (2, 2), (2, 1))))
    assert(near(area(Overlay.overlayPolygons(A, C, Overlay.Inter)), 2.0))
    assert(near(area(Overlay.overlayPolygons(A, C, Overlay.Union)), 32.0))
    assert(near(area(Overlay.overlayPolygons(A, C, Overlay.Diff)), 30.0))
    // B strictly inside the hole: genuinely disjoint interiors
    val D = GPolygon(Vector(ring((2.5, 2.5), (3.5, 2.5), (3.5, 3.5),
      (2.5, 3.5), (2.5, 2.5))))
    assert(isEmpty(Overlay.overlayPolygons(A, D, Overlay.Inter)))
    val ud = Overlay.overlayPolygons(A, D, Overlay.Union)
    assert(near(area(ud), 33.0) && ud.isInstanceOf[GMultiPolygon])
    assert(near(area(Overlay.overlayPolygons(A, D, Overlay.Diff)), 32.0))
    // identical hole-carrying polygons
    assert(near(area(Overlay.overlayPolygons(A, A, Overlay.Inter)), 32.0))
    assert(near(area(Overlay.overlayPolygons(A, A, Overlay.Union)), 32.0))
    assert(isEmpty(Overlay.overlayPolygons(A, A, Overlay.Diff)))
  }

  /** Random integer box — same grid as genL, so boundary contact
    * (shared edges, vertex-on-edge, corner touch) is common.
    */
  private val genIntBox: Gen[Geom] = for {
    x <- Gen.choose(0, 10); y <- Gen.choose(0, 10)
    w <- Gen.choose(1, 5); h <- Gen.choose(1, 5)
  } yield GPolygon(Vector(Vector(
    Pt(x, y), Pt(x + w, y), Pt(x + w, y + h),
    Pt(x, y + h), Pt(x, y))))

  test("noded overlay: area algebra on integer-grid polygons") {
    check(forAll(genL, Gen.oneOf(genIntBox, genL)) { (a, b) =>
      // a zero-area intersection (pure edge/point contact) refuses —
      // it contributes 0 to the algebra
      val ia = try area(Overlay.overlayPolygons(a, b, Overlay.Inter))
        catch {
          case e: UnsupportedOperationException
              if e.getMessage.contains("zero-area") => 0.0
        }
      val ua = area(Overlay.overlayPolygons(a, b, Overlay.Union))
      val da = area(Overlay.overlayPolygons(a, b, Overlay.Diff))
      val db = area(Overlay.overlayPolygons(b, a, Overlay.Diff))
      near(ia + da, area(a)) &&
        near(ia + db, area(b)) &&
        near(ua, area(a) + area(b) - ia) &&
        near(area(Overlay.overlayPolygons(b, a, Overlay.Union)), ua)
    })
  }

  test("multi-component intersection comes back as separate rings") {
    // a U-shape crossed by a wide flat bar: two disjoint pockets
    val u = GPolygon(Vector(Vector(
      Pt(0, 0), Pt(7, 0), Pt(7, 5), Pt(5, 5), Pt(5, 2), Pt(2, 2),
      Pt(2, 5), Pt(0, 5), Pt(0, 0))))
    val bar = GPolygon(Vector(Vector(
      Pt(-0.5, 2.5), Pt(7.5, 2.5), Pt(7.5, 4.5), Pt(-0.5, 4.5),
      Pt(-0.5, 2.5))))
    val inter = Overlay.overlayPolygons(u, bar, Overlay.Inter)
    assert(near(area(inter), 8.0)) // two 2x2 pockets
    assert(inter.isInstanceOf[GMultiPolygon])
    assert(inter.asInstanceOf[GMultiPolygon].polys.length == 2)
    val union = Overlay.overlayPolygons(u, bar, Overlay.Union)
    assert(near(area(union), area(u) + area(bar) - 8.0))
  }
}
