package graft

import graft.lake.UrlEncode
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact parity with the reference's URLEncodePath
  * (pg_lake_engine/src/utils/url_encode.c; vectors from
  * test_iceberg_url_encode.py — encoded names must round-trip as
  * object-store keys AND as local file names).
  */
class UrlEncodeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  // (input, expected) straight from the reference pytest (the doubled
  // SQL quotes there collapse to one apostrophe before encoding)
  private val vectors = Seq(
    "  ..!!~~**'(());;//??::@@&&==  $$,,##" ->
      ("%20%20..%21%21%7e%7e%2a%2a%27%28%28%29%29%3b%3b%2f%2f" +
        "%3f%3f%3a%3a%40%40%26%26%3d%3d%20%20%24%24%2c%2c%23%23"),
    "Special- Schema!_With.Multiple_Uses_Of@Chars#-Here~And*Here!" ->
      "Special-%20Schema%21_With.Multiple_Uses_Of%40Chars%23-Here%7eAnd%2aHere%21",
    "Special-Table!_With.Multiple_Uses_Of@Chars#-Here~And*Here!" ->
      "Special-Table%21_With.Multiple_Uses_Of%40Chars%23-Here%7eAnd%2aHere%21")

  test("reference vectors encode byte-identically") {
    vectors.foreach { case (in, want) =>
      assert(UrlEncode.path(in) == want, s"input <$in>")
    }
    // '+' is in the reserved set; '.', '-', '_' and non-ASCII are not
    assert(UrlEncode.path("a+b") == "a%2bb")
    assert(UrlEncode.path("ü.par-quet_1") == "ü.par-quet_1")
  }

  test("encoded names survive as local file names (pytest round trip)") {
    val dir = java.nio.file.Files.createTempDirectory("urlenc")
    vectors.foreach { case (in, enc) =>
      val p = dir.resolve(enc)
      java.nio.file.Files.write(p, s"Test content for $in".getBytes("UTF-8"))
      assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8") ==
        s"Test content for $in")
    }
  }

  test("SQL surface: SELECT lake_iceberg.url_encode_path('...')") {
    val e = LakeEngine(spark)
    val r = e.sql(
      "SELECT lake_iceberg.url_encode_path('a b''c/d')").first().getString(0)
    assert(r == "a%20b%27c%2fd")
  }

  test("default managed-table locations encode the name segment") {
    val loc = LakeEngine.defaultTableLocation(spark, "Has Space&Amp")
    val seg = loc.substring(loc.lastIndexOf('/') + 1)
    assert(seg.startsWith("has%20space%26amp_"), seg)
  }
}
