package graft

import graft.functions.Geometry
import graft.functions.Geometry._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the pure geometry core plus SQL-level smoke of the
  * st_* registry (SURVEY.md §2.7 "Spatial"). The judged q_spatial_*
  * queries prove engine-vs-oracle equivalence; this spec pins the
  * algorithmic semantics on hand-computed figures.
  */
class SpatialSpec extends AnyFunSuite {
  private def sparkSession = SparkTestSession.spark

  private def wkt(s: String): Geom = parseWkt(s)

  test("WKT roundtrip across all seven geometry types") {
    val cases = Seq(
      "POINT(1 2)",
      "POINT EMPTY",
      "MULTIPOINT(1 2, 3 4)",
      "LINESTRING(0 0, 1 1, 2 0)",
      "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))",
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
      "GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(0 0, 1 1))")
    cases.foreach { c => assert(toWkt(wkt(c)) == c, s"roundtrip of $c") }
  }

  test("WKB roundtrip preserves structure and SRID") {
    val cases = Seq(
      "POINT(1.5 -2.25)",
      "MULTIPOINT(1 2, 3 4)",
      "LINESTRING(0 0, 1 1, 2 0)",
      "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)))",
      "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))",
      "GEOMETRYCOLLECTION(POINT(1 2), POLYGON((0 0, 1 0, 1 1, 0 0)))")
    cases.foreach { c =>
      val g = wkt(c)
      assert(parseWkb(toWkb(g)) == g, s"wkb roundtrip of $c")
      val withSrid = g.withSrid(4326)
      assert(parseWkb(toWkb(withSrid)) == withSrid, s"ewkb roundtrip of $c")
    }
  }

  test("EWKT SRID prefix parses") {
    val g = wkt("SRID=3857;POINT(10 20)")
    assert(g.srid == 3857)
    assert(toWkt(g) == "POINT(10 20)")
  }

  test("area: rectangle, triangle, polygon with hole, shoelace invariance") {
    assert(area(wkt("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")) == 12.0)
    assert(area(wkt("POLYGON((0 0, 4 0, 0 3, 0 0))")) == 6.0)
    assert(area(wkt(
      "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")) == 96.0)
    // winding direction must not matter
    assert(area(wkt("POLYGON((0 0, 0 3, 4 3, 4 0, 0 0))")) == 12.0)
    assert(area(wkt("LINESTRING(0 0, 5 5)")) == 0.0)
  }

  test("length and perimeter") {
    assert(Geometry.length(wkt("LINESTRING(0 0, 3 4)")) == 5.0)
    assert(Geometry.length(wkt("MULTILINESTRING((0 0, 3 4), (0 0, 0 2))")) == 7.0)
    assert(perimeter(wkt("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")) == 14.0)
    // holes add to perimeter like PostGIS
    assert(perimeter(wkt(
      "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")) == 48.0)
    assert(Geometry.length(wkt("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")) == 0.0)
  }

  test("centroid: points, lines, polygons, holes") {
    assert(centroid(wkt("MULTIPOINT(0 0, 2 0, 4 6)")).get == Pt(2.0, 2.0))
    assert(centroid(wkt("LINESTRING(0 0, 4 0)")).get == Pt(2.0, 0.0))
    assert(centroid(wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")).get == Pt(2.0, 2.0))
    // symmetric hole keeps the centroid at the center
    val holed = wkt(
      "POLYGON((0 0, 8 0, 8 8, 0 8, 0 0), (3 3, 5 3, 5 5, 3 5, 3 3))")
    assert(centroid(holed).get == Pt(4.0, 4.0))
    // asymmetric hole shifts it away from the hole
    val shifted = wkt(
      "POLYGON((0 0, 8 0, 8 8, 0 8, 0 0), (0 0, 4 0, 4 4, 0 4, 0 0))")
    val c = centroid(shifted).get
    assert(c.x > 4.0 && c.y > 4.0)
  }

  test("distance: point/segment/polygon combinations") {
    val p = wkt("POINT(0 0)")
    assert(distance(p, wkt("POINT(3 4)")) == 5.0)
    assert(distance(p, wkt("LINESTRING(2 -10, 2 10)")) == 2.0)
    // beyond the segment end: distance to the endpoint
    assert(distance(p, wkt("LINESTRING(3 4, 10 4)")) == 5.0)
    val poly = wkt("POLYGON((2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(distance(p, poly) == math.sqrt(8.0))
    // intersecting geometries: 0
    assert(distance(wkt("POINT(3 3)"), poly) == 0.0)
    assert(distance(wkt("LINESTRING(0 3, 10 3)"), poly) == 0.0)
  }

  test("point-in-polygon: interior, boundary, holes, exactness") {
    val rs = wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
      .asInstanceOf[GPolygon].rings
    assert(locateInPolygon(rs, Pt(2, 2)) == 2)
    assert(locateInPolygon(rs, Pt(0, 5)) == 1) // outer boundary
    assert(locateInPolygon(rs, Pt(5, 5)) == 0) // inside hole
    assert(locateInPolygon(rs, Pt(4, 5)) == 1) // hole boundary
    assert(locateInPolygon(rs, Pt(11, 5)) == 0)
    assert(locateInPolygon(rs, Pt(10, 10)) == 1) // corner
  }

  test("contains vs covers: boundary semantics match PostGIS") {
    val sq = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    val boundaryPt = wkt("POINT(0 2)")
    val interiorPt = wkt("POINT(2 2)")
    assert(contains(sq, interiorPt))
    assert(!contains(sq, boundaryPt)) // ST_Contains excludes boundary
    assert(covers(sq, boundaryPt)) // ST_Covers includes it
    assert(within(interiorPt, sq))
    assert(coveredBy(boundaryPt, sq))
    // polygon in polygon
    val inner = wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(contains(sq, inner) && covers(sq, inner))
    val overlapping = wkt("POLYGON((3 3, 6 3, 6 6, 3 6, 3 3))")
    assert(!contains(sq, overlapping))
    // shared-edge polygon is covered but still contained (interior overlaps)
    val edge = wkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert(covers(sq, edge) && contains(sq, edge))
    // a polygon containing a hole does NOT contain points of the hole
    val holed = wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(!contains(holed, wkt("POINT(5 5)")))
  }

  test("intersects and disjoint across shapes") {
    val sq = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(intersects(sq, wkt("POLYGON((3 3, 6 3, 6 6, 3 6, 3 3))")))
    assert(intersects(sq, wkt("POLYGON((4 0, 8 0, 8 4, 4 4, 4 0))"))) // edge touch
    assert(intersects(sq, wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"))) // containment
    assert(intersects(wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"), sq)) // reversed
    assert(disjoint(sq, wkt("POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))")))
    assert(intersects(wkt("LINESTRING(-1 2, 5 2)"), sq))
    assert(intersects(wkt("POINT(4 4)"), sq)) // corner touch
    assert(disjoint(wkt("POINT(5 5)"), sq))
    assert(intersects(wkt("LINESTRING(0 0, 2 2)"), wkt("LINESTRING(0 2, 2 0)")))
    assert(intersects(wkt("LINESTRING(0 0, 2 2)"), wkt("LINESTRING(1 1, 3 3)"))) // collinear overlap
    assert(disjoint(wkt("LINESTRING(0 0, 1 1)"), wkt("LINESTRING(2 2, 3 3)")))
  }

  test("envelope, makeEnvelope degenerate forms, min/max accessors") {
    val e = envelope(wkt("LINESTRING(1 2, 5 -3, 4 7)"))
    assert(toWkt(e) == "POLYGON((1 -3, 5 -3, 5 7, 1 7, 1 -3))")
    assert(toWkt(makeEnvelope(1, 1, 1, 1)) == "POINT(1 1)")
    assert(toWkt(makeEnvelope(1, 1, 1, 5)) == "LINESTRING(1 1, 1 5)")
  }

  test("convex hull: square cloud, collinear degenerates") {
    val hull = convexHull(wkt("MULTIPOINT(0 0, 4 0, 4 4, 0 4, 2 2, 1 3)"))
    assert(area(hull) == 16.0)
    assert(allPoints(hull).length == 5) // 4 corners + closure
    val line = convexHull(wkt("MULTIPOINT(0 0, 1 1, 2 2)"))
    assert(toWkt(line) == "LINESTRING(0 0, 2 2)")
    assert(toWkt(convexHull(wkt("POINT(3 3)"))) == "POINT(3 3)")
  }

  test("simplify: Douglas-Peucker drops near-collinear vertices") {
    val l = wkt("LINESTRING(0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    assert(toWkt(simplify(l, 0.1)) == "LINESTRING(0 0, 4 0)")
    // below tolerance: keeps the significant vertex
    val bent = wkt("LINESTRING(0 0, 2 3, 4 0)")
    assert(toWkt(simplify(bent, 0.1)) == "LINESTRING(0 0, 2 3, 4 0)")
    // polygon rings stay closed and valid
    val sq = wkt("POLYGON((0 0, 2 0.001, 4 0, 4 4, 0 4, 0 0))")
    assert(toWkt(simplify(sq, 0.1)) == "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
  }

  test("buffer: point circle area converges; non-point refused") {
    val b = bufferPoint(wkt("POINT(0 0)"), 10.0)
    val a = area(b)
    assert(a > math.Pi * 100 * 0.99 && a < math.Pi * 100)
    assert(allPoints(b).length == 33) // 32 segments + closure
    intercept[UnsupportedOperationException] {
      bufferPoint(wkt("LINESTRING(0 0, 1 1)"), 1.0)
    }
  }

  test("transforms: translate/scale/flip/snap/reverse") {
    assert(toWkt(translate(wkt("POINT(1 2)"), 10, 20)) == "POINT(11 22)")
    assert(toWkt(scale(wkt("LINESTRING(1 1, 2 2)"), 2, 3)) == "LINESTRING(2 3, 4 6)")
    assert(toWkt(flipCoordinates(wkt("POINT(1 2)"))) == "POINT(2 1)")
    assert(toWkt(snapToGrid(wkt("POINT(1.24 5.81)"), 0.5)) == "POINT(1 6)")
    assert(toWkt(Geometry.reverse(wkt("LINESTRING(0 0, 1 1, 2 0)"))) ==
      "LINESTRING(2 0, 1 1, 0 0)")
  }

  test("SRID transform 4326<->3857 roundtrips; others refused") {
    val p = wkt("POINT(10 45)").withSrid(4326)
    val merc = transform(p, 3857)
    assert(merc.srid == 3857)
    val Pt(mx, my) = allPoints(merc).head
    assert(math.abs(mx - 1113194.9079327357) < 1e-6)
    assert(math.abs(my - 5621521.486192066) < 1e-6)
    val back = transform(merc, 4326)
    val Pt(bx, by) = allPoints(back).head
    assert(math.abs(bx - 10) < 1e-9 && math.abs(by - 45) < 1e-9)
    // 2154 (Lambert-93) moved into the closed-form registry; an
    // unregistered CRS still refuses
    intercept[UnsupportedOperationException] { transform(p, 999999) }
    intercept[IllegalArgumentException] { transform(wkt("POINT(0 0)"), 3857) }
  }

  test("azimuth quadrants") {
    assert(azimuth(Pt(0, 0), Pt(0, 1)).get == 0.0) // north
    assert(azimuth(Pt(0, 0), Pt(1, 0)).get == math.Pi / 2) // east
    assert(azimuth(Pt(0, 0), Pt(0, -1)).get == math.Pi) // south
    assert(azimuth(Pt(0, 0), Pt(-1, 0)).get == 3 * math.Pi / 2) // west
    assert(azimuth(Pt(1, 1), Pt(1, 1)).isEmpty)
  }

  test("collect and union") {
    assert(toWkt(collect(wkt("POINT(1 1)"), wkt("POINT(2 2)"))) ==
      "MULTIPOINT(1 1, 2 2)")
    assert(toWkt(unionPoints(wkt("MULTIPOINT(1 1, 2 2)"), wkt("POINT(1 1)"))) ==
      "MULTIPOINT(1 1, 2 2)")
    intercept[IllegalArgumentException] {
      unionPoints(wkt("POINT(0 0)"), wkt("LINESTRING(0 0, 1 1)"))
    }
  }

  test("st_* functions work end-to-end in Spark SQL") {
    val spark = sparkSession
    graft.functions.PgFunctions.register(spark)
    import spark.implicits._
    val row = spark.sql(
      """SELECT
        |  st_astext(st_centroid(st_geomfromtext('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS c,
        |  st_area(st_geomfromtext('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))')) AS a,
        |  st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0)) AS d,
        |  st_contains(st_makeenvelope(0.0, 0.0, 10.0, 10.0), st_point(5.0, 5.0)) AS inside,
        |  st_npoints(st_geomfromtext('LINESTRING(0 0, 1 1, 2 2)')) AS np,
        |  st_srid(st_setsrid(st_point(1.0, 2.0), 4326)) AS srid,
        |  st_geometrytype(st_point(1.0, 2.0)) AS gt,
        |  st_astext(st_geomfromwkb(st_asbinary(st_point(7.0, 8.0)))) AS rt
        |""".stripMargin).as[(String, Double, Double, Boolean, Int, Int, String, String)]
      .head()
    assert(row == ("POINT(2 2)", 16.0, 5.0, true, 3, 4326, "ST_Point", "POINT(7 8)"))
  }

  test("st_* null propagation in SQL") {
    val spark = sparkSession
    graft.functions.PgFunctions.register(spark)
    val r = spark.sql(
      """SELECT st_x(CAST(NULL AS BINARY)) AS a,
        |  st_distance(st_point(0.0, 0.0), CAST(NULL AS BINARY)) AS b,
        |  st_astext(st_point(CAST(NULL AS DOUBLE), 1.0)) AS c""".stripMargin)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("touches: boundary contact without interior overlap") {
    val sq = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    // edge-adjacent square: shares the x=4 edge, interiors disjoint
    assert(Geometry.touches(sq, wkt("POLYGON((4 0, 8 0, 8 4, 4 4, 4 0))")))
    // corner-adjacent square
    assert(Geometry.touches(sq, wkt("POLYGON((4 4, 8 4, 8 8, 4 8, 4 4))")))
    // overlapping square does NOT touch
    assert(!Geometry.touches(sq, wkt("POLYGON((2 2, 6 2, 6 6, 2 6, 2 2))")))
    // disjoint square does NOT touch
    assert(!Geometry.touches(sq, wkt("POLYGON((9 9, 10 9, 10 10, 9 10, 9 9))")))
    // point on boundary touches; interior point does not
    assert(Geometry.touches(sq, wkt("POINT(4 2)")))
    assert(!Geometry.touches(sq, wkt("POINT(2 2)")))
    // line ending on the boundary touches; line passing through does not
    assert(Geometry.touches(sq, wkt("LINESTRING(4 2, 8 2)")))
    assert(!Geometry.touches(sq, wkt("LINESTRING(2 2, 8 2)")))
    // two lines meeting at shared endpoints touch
    assert(Geometry.touches(
      wkt("LINESTRING(0 0, 1 1)"), wkt("LINESTRING(1 1, 2 0)")))
    // X-crossing lines do not touch (interiors meet)
    assert(!Geometry.touches(
      wkt("LINESTRING(0 0, 2 2)"), wkt("LINESTRING(0 2, 2 0)")))
  }

  test("crosses: partial pass-through at lower dimension") {
    val sq = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    // line entering and leaving the area crosses
    assert(Geometry.crosses(wkt("LINESTRING(-1 2, 5 2)"), sq))
    // line fully inside does not cross (covered)
    assert(!Geometry.crosses(wkt("LINESTRING(1 2, 3 2)"), sq))
    // line along the boundary does not cross (no interior intersection)
    assert(!Geometry.crosses(wkt("LINESTRING(0 0, 4 0)"), sq))
    // X-crossing lines cross at a point
    assert(Geometry.crosses(
      wkt("LINESTRING(0 0, 2 2)"), wkt("LINESTRING(0 2, 2 0)")))
    // collinear overlapping lines do NOT cross (1-dim intersection)
    assert(!Geometry.crosses(
      wkt("LINESTRING(0 0, 2 0)"), wkt("LINESTRING(1 0, 3 0)")))
    // multipoint with one point in, one out, crosses the area
    assert(Geometry.crosses(wkt("MULTIPOINT(2 2, 9 9)"), sq))
    // all points inside: no cross (covered)
    assert(!Geometry.crosses(wkt("MULTIPOINT(1 1, 2 2)"), sq))
  }

  test("overlaps: same-dimension partial overlap") {
    val sq = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(Geometry.overlaps(sq, wkt("POLYGON((2 2, 6 2, 6 6, 2 6, 2 2))")))
    // containment is not overlap
    assert(!Geometry.overlaps(sq, wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")))
    // touching is not overlap
    assert(!Geometry.overlaps(sq, wkt("POLYGON((4 0, 8 0, 8 4, 4 4, 4 0))")))
    // collinear partial line overlap
    assert(Geometry.overlaps(
      wkt("LINESTRING(0 0, 2 0)"), wkt("LINESTRING(1 0, 3 0)")))
    // crossing lines share only a point: not overlaps
    assert(!Geometry.overlaps(
      wkt("LINESTRING(0 0, 2 2)"), wkt("LINESTRING(0 2, 2 0)")))
    // different dimensions never overlap
    assert(!Geometry.overlaps(sq, wkt("LINESTRING(-1 2, 5 2)")))
  }

  test("containsproperly: interior-only containment") {
    val sq = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(containsProperly(sq, wkt("POINT(2 2)")))
    assert(!containsProperly(sq, wkt("POINT(4 2)"))) // boundary
    assert(containsProperly(sq, wkt("POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))")))
    // touching the boundary from inside: contained but not properly
    assert(contains(sq, wkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")))
    assert(!containsProperly(sq, wkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")))
  }

  test("issimple / isring / isvalid") {
    assert(isSimple(wkt("LINESTRING(0 0, 1 1, 2 0)")))
    // figure-eight self-crossing is not simple
    assert(!isSimple(wkt("LINESTRING(0 0, 2 2, 2 0, 0 2)")))
    // closed ring is simple
    assert(isSimple(wkt("LINESTRING(0 0, 2 0, 2 2, 0 2, 0 0)")))
    assert(isRing(wkt("LINESTRING(0 0, 2 0, 2 2, 0 2, 0 0)")))
    assert(!isRing(wkt("LINESTRING(0 0, 2 0, 2 2)"))) // open
    assert(!isSimple(wkt("MULTIPOINT(1 1, 1 1)")))
    assert(isValid(wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")))
    // bow-tie ring is invalid
    assert(!isValid(wkt("POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))")))
    // hole outside the shell is invalid
    assert(!isValid(wkt(
      "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0), (5 5, 6 5, 6 6, 5 6, 5 5))")))
  }

  test("pointn, pointonsurface, removerepeatedpoints, makepolygon") {
    val line = wkt("LINESTRING(0 0, 1 1, 2 0)")
    assert(pointN(line, 2).contains(Pt(1, 1)))
    assert(pointN(line, -1).contains(Pt(2, 0)))
    assert(pointN(line, 9).isEmpty)
    val sq = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    val pos = pointOnSurface(sq).get
    assert(locateInPolygon(sq.asInstanceOf[GPolygon].rings, pos) == 2)
    assert(removeRepeatedPoints(
      wkt("LINESTRING(0 0, 0 0, 1 1, 1 1, 2 0)")) ==
      wkt("LINESTRING(0 0, 1 1, 2 0)"))
    assert(makePolygon(wkt("LINESTRING(0 0, 2 0, 2 2, 0 0)")) ==
      wkt("POLYGON((0 0, 2 0, 2 2, 0 0))"))
    intercept[IllegalArgumentException] {
      makePolygon(wkt("LINESTRING(0 0, 2 0, 2 2)"))
    }
  }

  test("linemerge stitches shared endpoints") {
    assert(lineMerge(wkt("MULTILINESTRING((0 0, 1 1), (1 1, 2 2))")) ==
      wkt("LINESTRING(0 0, 1 1, 2 2)"))
    // reversed continuation still merges
    assert(lineMerge(wkt("MULTILINESTRING((0 0, 1 1), (2 2, 1 1))")) ==
      wkt("LINESTRING(0 0, 1 1, 2 2)"))
    // disconnected parts stay apart
    assert(lineMerge(wkt("MULTILINESTRING((0 0, 1 1), (5 5, 6 6))")) ==
      wkt("MULTILINESTRING((0 0, 1 1), (5 5, 6 6))"))
  }

  test("normalize is canonical and idempotent") {
    // same square written four ways normalizes identically
    val forms = Seq(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON((4 4, 0 4, 0 0, 4 0, 4 4))",
      "POLYGON((0 4, 0 0, 4 0, 4 4, 0 4))",
      "POLYGON((0 0, 0 4, 4 4, 4 0, 0 0))").map(s => normalize(wkt(s)))
    assert(forms.distinct.size == 1)
    assert(normalize(forms.head) == forms.head, "idempotent")
    assert(normalize(wkt("MULTIPOINT(3 3, 1 1, 2 2)")) ==
      wkt("MULTIPOINT(1 1, 2 2, 3 3)"))
  }

  test("shortestline and collectionextract") {
    val l = shortestLine(wkt("POINT(0 5)"),
      wkt("LINESTRING(0 0, 10 0)")).asInstanceOf[GLine]
    assert(l.pts == Vector(Pt(0, 5), Pt(0, 0)))
    // intersecting inputs give a zero-length witness
    val z = shortestLine(wkt("LINESTRING(0 0, 2 2)"),
      wkt("LINESTRING(0 2, 2 0)")).asInstanceOf[GLine]
    assert(z.pts(0) == z.pts(1) && z.pts(0) == Pt(1, 1))
    val coll = wkt(
      "GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(0 0, 1 1), POINT(3 4))")
    assert(collectionExtract(coll, 1) == wkt("MULTIPOINT(1 2, 3 4)"))
    assert(collectionExtract(coll, 2) == wkt("MULTILINESTRING((0 0, 1 1))"))
  }

  test("geojson roundtrip and sql surface of the new functions") {
    val spark = sparkSession
    graft.functions.PgFunctions.register(spark)
    import spark.implicits._
    val row = spark.sql(
      """SELECT
        |  st_asgeojson(st_point(1.0, 2.0)) AS gj,
        |  st_astext(st_geomfromgeojson('{"type":"Point","coordinates":[3,4]}')) AS p,
        |  st_touches(st_geomfromtext('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))'),
        |             st_geomfromtext('POLYGON((4 0, 8 0, 8 4, 4 4, 4 0))')) AS t,
        |  st_crosses(st_geomfromtext('LINESTRING(-1 2, 5 2)'),
        |             st_geomfromtext('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))')) AS c,
        |  st_isring(st_geomfromtext('LINESTRING(0 0, 2 0, 2 2, 0 2, 0 0)')) AS r,
        |  st_astext(st_pointn(st_geomfromtext('LINESTRING(0 0, 1 1, 2 0)'), 2)) AS pn,
        |  st_astext(st_reduceprecision(st_geomfromtext('LINESTRING(0.04 0.04, 0.96 1.02)'), 1.0)) AS rp
        |""".stripMargin)
      .as[(String, String, Boolean, Boolean, Boolean, String, String)].head()
    assert(row == (
      """{"type":"Point","coordinates":[1,2]}""", "POINT(3 4)",
      true, true, true, "POINT(1 1)", "LINESTRING(0 0, 1 1)"))
    // geojson of a polygon parses back to the same geometry
    val sq = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert(graft.sources.GeoJson.parseGeometryString(
      toGeoJson(wkt(sq))) == wkt(sq))
  }

  test("intersection with a convex clipper: boxes, lines, points") {
    val box = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    // box ∩ box = overlap rectangle, area 4
    val inter = intersectionWithConvex(
      wkt("POLYGON((2 2, 6 2, 6 6, 2 6, 2 2))"), box)
    assert(area(inter) == 4.0, toWkt(inter))
    // fully inside: unchanged area
    assert(area(intersectionWithConvex(
      wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"), box)) == 1.0)
    // fully outside: empty
    assert(isEmpty(intersectionWithConvex(
      wkt("POLYGON((9 9, 10 9, 10 10, 9 10, 9 9))"), box)))
    // triangle clipped by box: half-square of area 8 stays 8
    assert(area(intersectionWithConvex(
      wkt("POLYGON((0 0, 4 0, 4 4, 0 0))"), box)) == 8.0)
    // line passing through: clipped to the chord
    val chord = intersectionWithConvex(
      wkt("LINESTRING(-2 2, 6 2)"), box).asInstanceOf[GLine]
    assert(chord.pts == Vector(Pt(0, 2), Pt(4, 2)))
    // line dipping in and out: two pieces
    val vee = intersectionWithConvex(
      wkt("LINESTRING(-1 1, 2 1, 2 -2, 3 -2, 3 1, 5 1)"), box)
    assert(vee.isInstanceOf[GMultiLine], toWkt(vee))
    assert(Geometry.length(vee) == (2.0 + 1.0) + (1.0 + 1.0), toWkt(vee))
    // points filter by containment
    assert(intersectionWithConvex(wkt("MULTIPOINT(1 1, 9 9)"), box) ==
      wkt("MULTIPOINT(1 1)"))
    // non-convex clipper refused
    intercept[IllegalArgumentException] {
      intersectionWithConvex(box, wkt("POLYGON((0 0, 4 0, 1 1, 0 4, 0 0))"))
    }
  }

  test("st_extent aggregate and st_intersection in SQL") {
    val spark = sparkSession
    graft.functions.PgFunctions.register(spark)
    import spark.implicits._
    val r = spark.sql(
      """SELECT st_astext(st_extent(g)) AS ext FROM (
        |  SELECT st_point(CAST(id AS DOUBLE), CAST(id * 2 AS DOUBLE)) AS g
        |  FROM range(1, 6))""".stripMargin).as[String].head()
    assert(r == "POLYGON((1 2, 5 2, 5 10, 1 10, 1 2))", r)
    // extent over an empty relation is NULL
    val e = spark.sql(
      """SELECT st_extent(g) AS ext FROM (
        |  SELECT st_point(1.0, 1.0) AS g WHERE 1 = 0)""".stripMargin).head()
    assert(e.isNullAt(0))
    // st_intersection end-to-end
    val a = spark.sql(
      """SELECT st_area(st_intersection(
        |  st_geomfromtext('POLYGON((2 2, 6 2, 6 6, 2 6, 2 2))'),
        |  st_geomfromtext('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS a"""
        .stripMargin).as[Double].head()
    assert(a == 4.0)
  }

  test("simplifypreservetopology never drops a ring") {
    // a tiny square collapses under plain simplify at tol 10 but
    // survives the topology-preserving variant
    val tiny = wkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(simplify(tiny, 10.0).asInstanceOf[GPolygon].rings.isEmpty)
    val kept = simplifyPreserveTopology(tiny, 10.0).asInstanceOf[GPolygon]
    assert(kept.rings.nonEmpty && kept.rings.head.length >= 4)
    // above-tolerance detail is still dropped like plain simplify
    val coarse = simplifyPreserveTopology(
      wkt("LINESTRING(0 0, 1 0.01, 2 0, 3 0.01, 4 0)"), 0.1)
    assert(coarse == wkt("LINESTRING(0 0, 4 0)"))
  }

  test("makevalid: bounded repair, identity on valid, loud on overlay") {
    // unclosed ring + repeated vertex: closed and deduped
    val open = GPolygon(Vector(Vector(
      Pt(0, 0), Pt(4, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4))), 0)
    assert(!isValid(open))
    val fixed = makeValid(open)
    assert(isValid(fixed))
    assert(toWkt(fixed) == "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    // valid input passes through unchanged
    val ok = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(makeValid(ok) eq ok)
    // single-vertex line collapses to its point (GEOS convention)
    assert(toWkt(makeValid(GLine(Vector(Pt(1, 2)), 0))) == "POINT(1 2)")
    // bow-tie self-intersection needs full overlay: loud refusal
    val bowtie = GPolygon(Vector(Vector(
      Pt(0, 0), Pt(2, 2), Pt(2, 0), Pt(0, 2), Pt(0, 0))), 0)
    intercept[UnsupportedOperationException] { makeValid(bowtie) }
  }

  test("difference: points exact, disjoint/covered fastpaths, loud overlay") {
    val box = wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    // multipoint minus polygon keeps only outside points (boundary is
    // covered, so it is removed too)
    val mp = wkt("MULTIPOINT(1 1, 4 4, 9 9)")
    assert(toWkt(difference(mp, box)) == "MULTIPOINT(9 9)")
    // disjoint: subject unchanged
    val far = wkt("POLYGON((10 10, 12 10, 12 12, 10 12, 10 10))")
    assert(difference(far, box) eq far)
    // covered: empty of the subject's type
    val inner = wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(isEmpty(difference(inner, box)))
    assert(difference(inner, box).isInstanceOf[GPolygon])
    // partial polygon overlap now runs the general overlay: the
    // 4x4 square minus the 4x4 box overlapping its lower-left
    // quarter keeps 16 - 4 = 12 of area
    val overlap = wkt("POLYGON((2 2, 6 2, 6 6, 2 6, 2 2))")
    assert(math.abs(area(difference(overlap, box)) - 12.0) < 1e-9)
    // line-minus-polygon keeps the outside piece (4,1)..(9,1)
    val line = wkt("LINESTRING(1 1, 9 1)")
    assert(math.abs(Geometry.length(difference(line, box)) - 5.0) < 1e-9)
    // degenerate contact still refuses loudly: collinear line overlap
    intercept[UnsupportedOperationException] {
      difference(wkt("LINESTRING(0 0, 4 0)"), wkt("LINESTRING(2 0, 6 0)"))
    }
  }

  test("zm surface: st_z/st_m null, zmflag 0, force3d loud") {
    val spark = sparkSession
    graft.functions.SpatialFunctions.register(spark)
    import spark.implicits._
    val r = spark.sql(
      """SELECT st_z(g), st_m(g), st_zmflag(g), st_zmflag(st_force2d(g))
        |FROM (SELECT st_point(1.0, 2.0) AS g)""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getInt(2) == 0 && r.getInt(3) == 0)
    val err = intercept[Exception] {
      spark.sql("SELECT st_force3dz(st_point(1.0, 2.0))").collect()
    }
    assert(err.getMessage.contains("2-D") ||
      err.getCause != null && err.getCause.getMessage.contains("2-D"))
    // st_difference + st_makevalid reachable from SQL
    val d = spark.sql(
      """SELECT st_astext(st_difference(
        |  st_geomfromtext('MULTIPOINT(1 1, 9 9)'),
        |  st_geomfromtext('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))')))"""
        .stripMargin).as[String].head()
    assert(d == "MULTIPOINT(9 9)")
  }

  // ---- mixed-dimension st_intersection ------------------------------

  test("line-line intersection: proper crossings, empties, refusals") {
    import graft.functions.Overlay
    val x = Overlay.intersectLines(
      wkt("LINESTRING(0 0, 4 4)"), wkt("LINESTRING(0 4, 4 0)"))
    assert(toWkt(x) == "POINT(2 2)")
    // zigzag crossing a line twice -> two points
    val x2 = Overlay.intersectLines(
      wkt("LINESTRING(0 1, 4 1)"), wkt("LINESTRING(0.5 0, 1.5 2, 2.5 0)"))
    assert(x2.isInstanceOf[GMultiPoint] && allPoints(x2).length == 2)
    // disjoint / parallel -> empty point
    assert(isEmpty(Overlay.intersectLines(
      wkt("LINESTRING(0 0, 1 0)"), wkt("LINESTRING(0 1, 1 1)"))))
    // collinear overlap refuses loudly
    intercept[UnsupportedOperationException] {
      Overlay.intersectLines(
        wkt("LINESTRING(0 0, 4 0)"), wkt("LINESTRING(2 0, 6 0)"))
    }
  }

  test("line clipped to non-convex polygons: lengths and pieces exact") {
    import graft.functions.Overlay
    val l = wkt("POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))")
    // horizontal probe through the foot: kept piece spans [0, 6]
    val c1 = Overlay.clipLinesToPolygon(
      wkt("LINESTRING(-0.5 1.5, 7.5 1.5)"), l)
    assert(math.abs(Geometry.length(c1) - 6.0) < 1e-9)
    // above the foot only the vertical arm remains: [0, 2]
    val c2 = Overlay.clipLinesToPolygon(
      wkt("LINESTRING(-0.5 3.5, 7.5 3.5)"), l)
    assert(math.abs(Geometry.length(c2) - 2.0) < 1e-9)
    // diagonal: enters at (0, 0.75), exits the arm at (2, 2.75)
    val c3 = Overlay.clipLinesToPolygon(
      wkt("LINESTRING(-0.5 0.25, 6.5 7.25)"), l)
    assert(math.abs(Geometry.length(c3) - 2 * math.sqrt(2)) < 1e-9)
    // U-shape probed across both prongs -> MULTILINESTRING, two pieces
    val u = wkt("POLYGON((0 0, 7 0, 7 5, 5 5, 5 2, 2 2, 2 5, 0 5, 0 0))")
    val c4 = Overlay.clipLinesToPolygon(
      wkt("LINESTRING(-0.5 3.5, 7.5 3.5)"), u)
    assert(c4.isInstanceOf[GMultiLine])
    assert(math.abs(Geometry.length(c4) - 4.0) < 1e-9)
    // fully inside / fully outside
    assert(math.abs(Geometry.length(Overlay.clipLinesToPolygon(
      wkt("LINESTRING(0.5 0.5, 1.5 0.5)"), l)) - 1.0) < 1e-9)
    assert(isEmpty(Overlay.clipLinesToPolygon(
      wkt("LINESTRING(4.5 3.5, 6.5 3.5)"), l)))
    // vertex-on-boundary refuses loudly
    intercept[UnsupportedOperationException] {
      Overlay.clipLinesToPolygon(wkt("LINESTRING(0 0, 3 1)"), l)
    }
  }

  test("st_intersection dispatches the full dimension matrix") {
    val spark = sparkSession
    graft.functions.SpatialFunctions.register(spark)
    import spark.implicits._
    val r = spark.sql(
      """SELECT
        |  st_astext(st_intersection(st_point(1.0, 1.0),
        |    st_geomfromtext('POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))'))),
        |  st_astext(st_intersection(
        |    st_makeline(st_point(0.0, 0.0), st_point(4.0, 4.0)),
        |    st_makeline(st_point(0.0, 4.0), st_point(4.0, 0.0)))),
        |  round(st_length(st_intersection(
        |    st_makeline(st_point(-0.5, 1.5), st_point(7.5, 1.5)),
        |    st_geomfromtext('POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))'))), 6),
        |  round(st_length(st_intersection(
        |    st_geomfromtext('POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))'),
        |    st_makeline(st_point(-0.5, 3.5), st_point(7.5, 3.5)))), 6)
        |""".stripMargin).head()
    assert(r.getString(0) == "POINT(1 1)")
    assert(r.getString(1) == "POINT(2 2)")
    assert(r.getDouble(2) == 6.0)
    assert(r.getDouble(3) == 2.0)
  }

  test("line union nodes at crossings; mixed-dim union/difference") {
    import graft.functions.Overlay
    val u = Overlay.unionLines(
      wkt("LINESTRING(0 0, 4 4)"), wkt("LINESTRING(0 4, 4 0)"))
    val ml = u.asInstanceOf[GMultiLine]
    assert(ml.lines.length == 2)
    assert(ml.lines.forall(_.length == 3)) // crossing became a vertex
    assert(ml.lines.forall(_.contains(Pt(2.0, 2.0))))
    assert(math.abs(Geometry.length(u) - 2 * math.sqrt(32)) < 1e-9)
    intercept[UnsupportedOperationException] {
      Overlay.unionLines(
        wkt("LINESTRING(0 0, 4 0)"), wkt("LINESTRING(2 0, 6 0)"))
    }

    val spark = sparkSession
    graft.functions.SpatialFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  round(st_length(st_difference(
        |    st_makeline(st_point(-0.5, 1.5), st_point(7.5, 1.5)),
        |    st_geomfromtext('POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))'))), 6),
        |  round(st_area(st_difference(
        |    st_geomfromtext('POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))'),
        |    st_makeline(st_point(-0.5, 1.5), st_point(7.5, 1.5)))), 6),
        |  round(st_area(st_union(
        |    st_geomfromtext('POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))'),
        |    st_makeline(st_point(-0.5, 1.5), st_point(7.5, 1.5)))), 6),
        |  round(st_length(st_union(
        |    st_geomfromtext('POLYGON((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))'),
        |    st_makeline(st_point(-0.5, 1.5), st_point(7.5, 1.5)))), 6),
        |  round(st_length(st_union(
        |    st_makeline(st_point(0.0, 0.0), st_point(4.0, 4.0)),
        |    st_makeline(st_point(0.0, 4.0), st_point(4.0, 0.0)))), 6)
        |""".stripMargin).head()
    // line minus L-polygon keeps the two outside stubs (0.5 + 1.5)
    assert(r.getDouble(0) == 2.0)
    // polygon minus a line loses measure zero: area unchanged
    assert(r.getDouble(1) == 20.0)
    // polygon ∪ line: area unchanged, only the OUTSIDE stubs carry
    // length (no double-counted covered span)
    assert(r.getDouble(2) == 20.0)
    assert(r.getDouble(3) == 2.0)
    // noded line union preserves total length
    assert(r.getDouble(4) == math.floor(2 * math.sqrt(32) * 1e6) / 1e6 ||
      math.abs(r.getDouble(4) - 2 * math.sqrt(32)) < 1e-5)
  }

  // ---- st_buffer on lines and polygons (capsule union) --------------

  test("line buffer: capsule geometry, area closed form, sandwich") {
    import graft.functions.Overlay
    val line = wkt("LINESTRING(0 0, 6 8)") // length 10
    val buf = Overlay.buffer(line, 2.0)
    // single capsule: 4q+2 distinct vertices (+ closing), exact area
    // 2rL + 2q r^2 sin(pi/2q)
    assert(buf.asInstanceOf[GPolygon].rings.head.length == 35)
    val expected = 2 * 2.0 * 10 + 16 * 4.0 * math.sin(math.Pi / 16)
    assert(math.abs(area(buf) - expected) < 1e-9)
    // sandwich: the discretized buffer contains everything within
    // r·cos(pi/4q) of the line and nothing beyond r
    val rng = new scala.util.Random(7)
    val inner = 2.0 * math.cos(math.Pi / 16) - 1e-9
    (0 until 300).foreach { _ =>
      val p = Pt(rng.nextDouble() * 14 - 4, rng.nextDouble() * 16 - 4)
      val d = distance(line, GPoint(Some(p)))
      if (d < inner)
        assert(covers(buf, GPoint(Some(p))), s"missing near point $p d=$d")
      if (d > 2.0)
        assert(!covers(buf, GPoint(Some(p))), s"stray far point $p d=$d")
    }
  }

  test("polyline and polygon buffer: union stays simple, sandwich holds") {
    import graft.functions.Overlay
    val zig = wkt("LINESTRING(0 0, 4 3, 8 0, 12 3)")
    val bz = Overlay.buffer(zig, 1.5)
    assert(bz.isInstanceOf[GPolygon] &&
      bz.asInstanceOf[GPolygon].rings.length == 1)
    val rng = new scala.util.Random(11)
    val innerZ = 1.5 * math.cos(math.Pi / 16) - 1e-9
    (0 until 300).foreach { _ =>
      val p = Pt(rng.nextDouble() * 16 - 2, rng.nextDouble() * 9 - 3)
      val d = distance(zig, GPoint(Some(p)))
      if (d < innerZ) assert(covers(bz, GPoint(Some(p))), s"missing $p")
      if (d > 1.5) assert(!covers(bz, GPoint(Some(p))), s"stray $p")
    }

    val square = wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    val bs = Overlay.buffer(square, 1.0)
    assert(bs.isInstanceOf[GPolygon] &&
      bs.asInstanceOf[GPolygon].rings.length == 1)
    // area between inscribed-arc and true round-corner buffer
    assert(area(bs) > 100 + 40 + 16 * math.sin(math.Pi / 16) - 1e-9)
    assert(area(bs) < 100 + 40 + math.Pi + 1e-9)
    assert(covers(bs, wkt("POINT(-0.9 5)")))
    assert(covers(bs, wkt("POINT(10.5 10.5)")))
    assert(!covers(bs, wkt("POINT(10.9 10.9)")))
    assert(covers(bs, square)) // buffered region contains the original

    // disjoint multipoint buffer: two separate discs
    val mp = Overlay.buffer(wkt("MULTIPOINT(0 0, 100 100)"), 1.0)
    assert(mp.isInstanceOf[GMultiPolygon])
    assert(math.abs(area(mp) - 2 * 16 * math.sin(math.Pi / 16)) < 1e-9)

    // exact u-turn resolves through the capsule-union fallback: the
    // backtrack leg is absorbed, so the result IS the first capsule
    val ut = Overlay.buffer(wkt("LINESTRING(0 0, 5 0, 1 0)"), 1.0)
    assert(math.abs(area(ut) -
      (2.0 * 5 + 16 * math.sin(math.Pi / 16))) < 1e-9)
  }

  // ---- st_transform: WGS84 UTM zones (Krüger series) ----------------
  // Validated by independent invariants rather than memorized vectors:
  // forward∘inverse identity, northing-vs-numerically-integrated
  // meridian arc on the central meridian, and local conformality.

  private def pt(lon: Double, lat: Double, srid: Int): Geom =
    GPoint(Some(Pt(lon, lat)), srid)
  private def xy(g: Geom): Pt = g.asInstanceOf[GPoint].pt.get

  test("utm transform: round-trip identity across zones and latitudes") {
    for {
      (srid, lon0) <- Seq((32631, 3.0), (32733, 15.0), (32601, -177.0))
      lat <- Seq(-75.0, -45.0, -0.5, 0.5, 33.0, 60.0, 80.0)
      dLon <- Seq(-2.9, -1.0, 0.0, 1.4, 2.9)
    } {
      val src = pt(lon0 + dLon, lat, 4326)
      val utm = transform(src, srid)
      val p = xy(utm)
      if (srid == 32733) assert(p.y > 0 && p.y < 2e7)
      val back = xy(transform(utm, 4326))
      assert(math.abs(back.x - (lon0 + dLon)) < 1e-9 &&
        math.abs(back.y - lat) < 1e-9,
        s"round-trip drift at zone $srid lon=${lon0 + dLon} lat=$lat: $back")
    }
  }

  test("utm transform: central-meridian northing equals k0 x meridian arc") {
    val a = 6378137.0; val f = 1.0 / 298.257223563
    val e2 = f * (2 - f)
    def meridianArc(latDeg: Double): Double = {
      // Simpson integration of a(1-e^2)(1-e^2 sin^2 t)^(-3/2)
      val n = 20000
      val h = math.toRadians(latDeg) / n
      def g(t: Double) = {
        val s = math.sin(t)
        a * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
      }
      var s = g(0) + g(math.toRadians(latDeg))
      var i = 1
      while (i < n) { s += (if (i % 2 == 1) 4 else 2) * g(i * h); i += 1 }
      s * h / 3
    }
    for (lat <- Seq(10.0, 45.0, 70.0)) {
      val p = xy(transform(pt(3.0, lat, 4326), 32631))
      assert(math.abs(p.x - 500000.0) < 1e-6,
        s"central meridian must map to the false easting: ${p.x}")
      assert(math.abs(p.y - 0.9996 * meridianArc(lat)) < 1e-3,
        s"northing off the scaled meridian arc at lat=$lat: " +
          s"${p.y} vs ${0.9996 * meridianArc(lat)}")
    }
    // equator origin
    val o = xy(transform(pt(3.0, 0.0, 4326), 32631))
    assert(math.abs(o.x - 500000.0) < 1e-6 && math.abs(o.y) < 1e-6)
  }

  test("utm transform: locally conformal (isotropic scale)") {
    val a = 6378137.0; val f = 1.0 / 298.257223563
    val e2 = f * (2 - f)
    for ((lon, lat) <- Seq((4.0, 40.0), (1.5, -35.0), (3.0, 70.0))) {
      val srid = if (lat >= 0) 32631 else 32731
      val base = xy(transform(pt(lon, lat, 4326), srid))
      val d = 1e-6 // degrees
      val east = xy(transform(pt(lon + d, lat, 4326), srid))
      val north = xy(transform(pt(lon, lat + d, 4326), srid))
      val s = math.sin(math.toRadians(lat))
      val nu = a / math.sqrt(1 - e2 * s * s)
      val rho = a * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
      val dEast = math.hypot(east.x - base.x, east.y - base.y)
      val dNorth = math.hypot(north.x - base.x, north.y - base.y)
      val mx = dEast / (math.toRadians(d) * nu * math.cos(math.toRadians(lat)))
      val my = dNorth / (math.toRadians(d) * rho)
      assert(math.abs(mx / my - 1) < 1e-5,
        s"anisotropic scale at ($lon,$lat): mx=$mx my=$my")
      // scale near the central meridian stays near k0
      assert(mx > 0.9995 && mx < 1.001, s"implausible scale $mx")
    }
  }

  test("utm transform: pivots through wgs84 from web mercator; refusals") {
    val merc = transform(pt(5.0, 52.0, 4326), 3857)
    val viaUtm = transform(merc, 32631)
    val direct = transform(pt(5.0, 52.0, 4326), 32631)
    val (p1, p2) = (xy(viaUtm), xy(direct))
    assert(math.abs(p1.x - p2.x) < 1e-6 && math.abs(p1.y - p2.y) < 1e-6)
    assert(viaUtm.srid == 32631)
    // unsupported CRS still refuses loudly
    intercept[UnsupportedOperationException] {
      transform(pt(1.0, 1.0, 4326), 999999)
    }
  }

  // ---- zero-area contact residue + multipolygon overlay -------------

  private def inter(a: String, b: String): Geom =
    graft.functions.SpatialOps.geomPairToGeom("st_intersection")(
      wkt(a), wkt(b))
  private def union2(a: String, b: String): Geom =
    graft.functions.SpatialOps.geomPairToGeom("st_union")(wkt(a), wkt(b))

  test("touching polygons intersect to their lower-dimensional contact") {
    // full shared edge → LINESTRING
    assert(toWkt(inter("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON((2 0, 4 0, 4 2, 2 2, 2 0))")) == "LINESTRING(2 0, 2 2)")
    // corner touch → POINT
    assert(toWkt(inter("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON((2 2, 4 2, 4 4, 2 4, 2 2))")) == "POINT(2 2)")
    // partial collinear overlap → the shared stretch only
    assert(toWkt(inter("POLYGON((0 0, 4 0, 4 2, 0 2, 0 0))",
      "POLYGON((1 -2, 3 -2, 3 0, 1 0, 1 -2))")) == "LINESTRING(1 0, 3 0)")
    // disjoint stays empty
    assert(isEmpty(inter("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))")))
  }

  test("multipolygon operands in intersection/union/difference") {
    val m = "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0))," +
      " ((4 0, 6 0, 6 2, 4 2, 4 0)))"
    val b = "POLYGON((1 1, 5 1, 5 3, 1 3, 1 1))"
    // two disjoint 1x1 pieces
    val i = inter(m, b)
    assert(math.abs(area(i) - 2.0) < 1e-9, toWkt(i))
    assert(i.isInstanceOf[GMultiPolygon], toWkt(i))
    // union area: 4 + 4 + 8 - 2 (shared)
    assert(math.abs(area(union2(m, b)) - 14.0) < 1e-9)
    // difference both ways
    assert(math.abs(area(difference(wkt(m), wkt(b))) - 6.0) < 1e-9)
    assert(math.abs(area(difference(wkt(b), wkt(m))) - 6.0) < 1e-9)
    // multipolygon × multipolygon
    val m2 = "MULTIPOLYGON(((1 0, 3 0, 3 1, 1 1, 1 0))," +
      " ((5 0, 7 0, 7 1, 5 1, 5 0)))"
    val ii = inter(m, m2)
    // [1,2]x[0,1] + [5,6]x[0,1] = 2
    assert(math.abs(area(ii) - 2.0) < 1e-9, toWkt(ii))
  }

  test("convex pairs keep exact areas through the general overlay") {
    // the dispatch change routes ALL areal pairs through the overlay;
    // the old convex-clipper result must be preserved exactly
    val a = inter("POLYGON((2 2, 6 2, 6 6, 2 6, 2 2))",
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(math.abs(area(a) - 4.0) < 1e-9)
    assert(toWkt(normalize(a)) == "POLYGON((2 2, 4 2, 4 4, 2 4, 2 2))",
      toWkt(a))
  }
}
