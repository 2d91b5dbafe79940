package graft

import graft.functions.Geometry._
import graft.sources.OpenDrive
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** The OpenDRIVE reader against spec-built XML fixtures; geometry
  * sampling is checked against closed forms (line, arc endpoints) and
  * an independent fine integration (spiral).
  */
class OpenDriveSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def doc(roads: String): Array[Byte] =
    s"""<?xml version="1.0"?>
       |<OpenDRIVE><header revMajor="1" revMinor="7"/>
       |$roads
       |</OpenDRIVE>""".stripMargin.getBytes(UTF_8)

  test("line segments sample exactly") {
    val rows = OpenDrive.parse(doc(
      """<road id="r1" name="main" length="10" junction="-1">
        |<planView>
        |<geometry s="0" x="0" y="0" hdg="0" length="6">
        |  <line/></geometry>
        |<geometry s="6" x="6" y="0" hdg="1.5707963267948966" length="4">
        |  <line/></geometry>
        |</planView></road>""".stripMargin), step = 2.0)
    assert(rows.length == 1 && rows.head._2 == "ST_LineString")
    val GLine(pts, _) = parseWkb(rows.head._1): @unchecked
    // 0..6 at step 2 then up the y axis to (6, 4); joint deduplicated
    assert(pts.head == Pt(0, 0))
    assert(math.abs(pts.last.x - 6.0) <= 1e-12)
    assert(math.abs(pts.last.y - 4.0) <= 1e-12)
    assert(pts.count(p => math.abs(p.y) < 1e-12) == 4)
    assert(rows.head._3 == Map("id" -> "r1", "name" -> "main",
      "length" -> "10", "junction" -> "-1"))
  }

  test("arc endpoint matches the closed-form quarter circle") {
    val r = 5.0
    val len = math.Pi * r / 2 // quarter turn, curvature 1/r
    val rows = OpenDrive.parse(doc(
      s"""<road id="a" length="$len" junction="-1"><planView>
         |<geometry s="0" x="0" y="0" hdg="0" length="$len">
         |  <arc curvature="${1 / r}"/></geometry>
         |</planView></road>""".stripMargin), step = 0.5)
    val GLine(pts, _) = parseWkb(rows.head._1): @unchecked
    // quarter circle from (0,0) heading +x, turning left: ends at (r, r)
    assert(math.abs(pts.last.x - r) <= 1e-9)
    assert(math.abs(pts.last.y - r) <= 1e-9)
  }

  test("spiral endpoint agrees with an independent fine integration") {
    val len = 10.0
    val k1 = 0.2
    val rows = OpenDrive.parse(doc(
      s"""<road id="s" length="$len" junction="-1"><planView>
         |<geometry s="0" x="0" y="0" hdg="0" length="$len">
         |  <spiral curvStart="0" curvEnd="$k1"/></geometry>
         |</planView></road>""".stripMargin), step = 0.1)
    val GLine(pts, _) = parseWkb(rows.head._1): @unchecked
    // independent: Simpson integration at 1e6 steps
    val n = 1000000
    val ds = len / n
    var (x, y) = (0.0, 0.0)
    (0 until n).foreach { i =>
      val s = (i + 0.5) * ds
      val th = k1 * s * s / (2 * len)
      x += ds * math.cos(th); y += ds * math.sin(th)
    }
    assert(math.abs(pts.last.x - x) <= 1e-3)
    assert(math.abs(pts.last.y - y) <= 1e-3)
  }

  test("paramPoly3 straight line is exact; refusals") {
    val rows = OpenDrive.parse(doc(
      """<road id="p" length="5" junction="-1"><planView>
        |<geometry s="0" x="1" y="2" hdg="0" length="5">
        |  <paramPoly3 aU="0" bU="5" cU="0" dU="0"
        |    aV="0" bV="0" cV="0" dV="0" pRange="normalized"/></geometry>
        |</planView></road>""".stripMargin), step = 1.0)
    val GLine(pts, _) = parseWkb(rows.head._1): @unchecked
    assert(pts.head == Pt(1, 2) && pts.last == Pt(6, 2))

    val e = intercept[Exception](OpenDrive.parse(doc(
      """<road id="z" length="1" junction="-1"><planView>
        |<geometry s="0" x="0" y="0" hdg="0" length="1">
        |  <bezier/></geometry>
        |</planView></road>""".stripMargin)))
    assert(e.getMessage.contains("not supported"))
    val e2 = intercept[Exception](
      OpenDrive.parse("<notOpenDrive/>".getBytes(UTF_8)))
    assert(e2.getMessage.contains("OpenDRIVE"))
  }
}
