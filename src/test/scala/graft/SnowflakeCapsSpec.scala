package graft

import graft.lake.{LakeTable, SnowflakeCaps}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snowflake per-column size caps under `compatibility_mode =
  * 'snowflake'` (reference test_iceberg_size_clamping.py;
  * iceberg_validation.h: 16 MiB STRING / 8 MiB BINARY): 'error' raises
  * identifying the column, 'clamp' truncates — strings at a UTF-8
  * char boundary (at or under the cap, never over, never a torn
  * char), binaries byte-exact; the cap is INCLUSIVE (a value at the
  * cap stores verbatim); tables outside snowflake mode are untouched.
  */
class SnowflakeCapsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLoc(): String =
    Files.createTempDirectory("sfcaps").toString + "/t"

  private val strCap = SnowflakeCaps.MaxStringBytes
  private val binCap = SnowflakeCaps.MaxBinaryBytes

  test("string over the cap: error names the column, clamp clips bytes") {
    val err = LakeTable.create(spark, freshLoc(), "caps_err",
      Seq(0).toDF("id").withColumn("v", lit("")).schema,
      properties = Map("compatibility_mode" -> "snowflake"))
    val over = "x" * (strCap + 7)
    val boom = intercept[Exception] {
      err.append(Seq((1, over)).toDF("id", "v"))
    }
    assert(boom.getMessage.contains("\"v\"") &&
      boom.getMessage.contains("Snowflake STRING column limit"),
      boom.getMessage.take(300))

    // the cap is inclusive: exactly-at-cap stores verbatim, no error
    val atCap = "y" * strCap
    err.append(Seq((2, atCap)).toDF("id", "v"))
    assert(err.read().filter(col("id") === 2)
      .select(octet_length(col("v"))).first().getInt(0) == strCap)

    val clamp = LakeTable.create(spark, freshLoc(), "caps_clamp",
      Seq((0, "")).toDF("id", "v").schema,
      properties = Map("compatibility_mode" -> "snowflake",
        "out_of_range_values" -> "clamp"))
    clamp.append(Seq((1, over)).toDF("id", "v"))
    val stored = clamp.read().filter(col("id") === 1)
      .select(octet_length(col("v"))).first().getInt(0)
    assert(stored == strCap, s"ASCII clamp must land exactly at the cap, got $stored")
  }

  test("multibyte clamp lands on a char boundary, never overshooting") {
    // 3-byte chars: the cap (16 MiB) is not divisible by 3, so a raw
    // byte clip would tear a character
    assert(strCap % 3 != 0)
    val ch = "€" // EURO SIGN, 3 UTF-8 bytes
    val over = ch * (strCap / 3 + 64)
    val t = LakeTable.create(spark, freshLoc(), "caps_mb",
      Seq((0, "")).toDF("id", "v").schema,
      properties = Map("compatibility_mode" -> "snowflake",
        "out_of_range_values" -> "clamp"))
    t.append(Seq((1, over)).toDF("id", "v"))
    val got = t.read().filter(col("id") === 1)
      .select(col("v"), octet_length(col("v"))).first()
    val bytes = got.getInt(1)
    assert(bytes <= strCap && bytes > strCap - 3,
      s"clip must land just under the cap, got $bytes")
    assert(bytes % 3 == 0, "a torn 3-byte char leaked into storage")
    assert(over.startsWith(got.getString(0)))
  }

  test("binary over the cap: clamp truncates byte-exact, error raises") {
    val over = Array.fill[Byte](binCap + 9)(42)
    val clamp = LakeTable.create(spark, freshLoc(), "caps_bin",
      Seq((0, Array[Byte]())).toDF("id", "b").schema,
      properties = Map("compatibility_mode" -> "snowflake",
        "out_of_range_values" -> "clamp"))
    clamp.append(Seq((1, over)).toDF("id", "b"))
    assert(clamp.read().filter(col("id") === 1)
      .select(length(col("b"))).first().getInt(0) == binCap)

    val err = LakeTable.create(spark, freshLoc(), "caps_bin_err",
      Seq((0, Array[Byte]())).toDF("id", "b").schema,
      properties = Map("compatibility_mode" -> "snowflake"))
    val boom = intercept[Exception] {
      err.append(Seq((1, over)).toDF("id", "b"))
    }
    assert(boom.getMessage.contains("Snowflake BINARY column limit"),
      boom.getMessage.take(300))
  }

  test("array-of-string leaves clamp; non-snowflake tables untouched") {
    val over = "z" * (strCap + 5)
    val t = LakeTable.create(spark, freshLoc(), "caps_arr",
      Seq((0, Seq(""))).toDF("id", "vs").schema,
      properties = Map("compatibility_mode" -> "snowflake",
        "out_of_range_values" -> "clamp"))
    t.append(Seq((1, Seq("ok", over))).toDF("id", "vs"))
    val lens = t.read().filter(col("id") === 1)
      .select(transform(col("vs"), v => octet_length(v)))
      .first().getSeq[Int](0)
    assert(lens == Seq(2, strCap))

    // plain (auto) tables keep oversize values verbatim
    val auto = LakeTable.create(spark, freshLoc(), "caps_auto",
      Seq((0, "")).toDF("id", "v").schema)
    auto.append(Seq((1, over)).toDF("id", "v"))
    assert(auto.read().filter(col("id") === 1)
      .select(octet_length(col("v"))).first().getInt(0) == strCap + 5)
  }
}
