package graft

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The `format 'gdal'` extension dispatcher. */
class GdalDispatchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val e = LakeEngine(spark)

  test("dispatches by extension to the native readers") {
    val dxf = Files.createTempFile("graft_gd", ".dxf")
    Files.write(dxf, ("0\nSECTION\n2\nENTITIES\n" +
      "0\nPOINT\n8\nl\n10\n1\n20\n2\n0\nENDSEC\n0\nEOF\n")
      .getBytes(US_ASCII))
    assert(e.createGdalTable("gd_dxf", dxf.toString).count() == 1)

    val geojson = Files.createTempFile("graft_gd", ".geojson")
    Files.write(geojson,
      """{"type":"Feature","geometry":{"type":"Point",
        |"coordinates":[1,2]},"properties":{}}""".stripMargin
        .getBytes(US_ASCII))
    assert(e.createGdalTable("gd_gj", geojson.toString).count() == 1)
  }

  test("proprietary and unknown formats refuse loudly") {
    val gdb = intercept[IllegalArgumentException](
      e.createGdalTable("x", "/tmp/a.gdb"))
    assert(gdb.getMessage.contains("proprietary"))
    val unk = intercept[IllegalArgumentException](
      e.createGdalTable("x", "/tmp/a.unknownext"))
    assert(unk.getMessage.contains("cannot infer"))
    val lay = intercept[IllegalArgumentException](
      e.createGdalTable("x", "/tmp/a.dxf", layer = Some("L1")))
    assert(lay.getMessage.contains("layer"))
  }
}
