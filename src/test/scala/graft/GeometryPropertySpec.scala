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
}
