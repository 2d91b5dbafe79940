package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** float4/float8 edge values survive the table round-trip bit-exactly
  * (reference test_float_roundtrip.py: NaN, ±Inf, ±0, max, subnormals,
  * shortest-decimal classics).
  */
class FloatRoundtripSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val f4Cases: Seq[(String, Float)] = Seq(
    "nan" -> Float.NaN, "inf" -> Float.PositiveInfinity,
    "neg_inf" -> Float.NegativeInfinity, "zero" -> 0.0f,
    "neg_zero" -> -0.0f, "max" -> Float.MaxValue,
    "neg_max" -> Float.MinValue, "just_below_max" -> 3.4028233e38f,
    "min_normal" -> java.lang.Float.MIN_NORMAL,
    "min_subnormal" -> java.lang.Float.MIN_VALUE,
    "neg_subnormal" -> -java.lang.Float.MIN_VALUE,
    "epsilon" -> 1.1920929e-7f, "point_one" -> 0.1f,
    "third" -> 0.333333343f, "pow2" -> 0.015625f,
    "max_int" -> 16777216.0f)

  private val f8Cases: Seq[(String, Double)] = Seq(
    "nan" -> Double.NaN, "inf" -> Double.PositiveInfinity,
    "neg_inf" -> Double.NegativeInfinity, "zero" -> 0.0,
    "neg_zero" -> -0.0, "max" -> Double.MaxValue,
    "neg_max" -> Double.MinValue,
    "min_normal" -> java.lang.Double.MIN_NORMAL,
    "min_subnormal" -> java.lang.Double.MIN_VALUE,
    "point_one" -> 0.1, "third" -> 1.0 / 3.0,
    "pi" -> math.Pi, "max_safe_int" -> 9007199254740992.0)

  test("float4/float8 edge values round-trip bit-exactly") {
    val e = LakeEngine(spark)
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("f4", FloatType), StructField("f8", DoubleType)))
    val f4 = f4Cases.toMap
    val f8 = f8Cases.toMap
    val rows = (f4Cases.map(_._1).toSet ++ f8Cases.map(_._1)).toSeq.sorted
      .map(k => Row(k, f4.getOrElse(k, 0.0f), f8.getOrElse(k, 0.0)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val t = e.createTableAsSelect("float_rt",
      LakeEngine.tempLocation("floatrt"), df)
    val back = e.sql("SELECT k, f4, f8 FROM float_rt").collect()
      .map(r => r.getString(0) -> (r.getFloat(1), r.getDouble(2))).toMap
    f4Cases.foreach { case (k, v) =>
      assert(java.lang.Float.floatToRawIntBits(back(k)._1) ==
        java.lang.Float.floatToRawIntBits(v), s"f4 $k")
    }
    f8Cases.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(back(k)._2) ==
        java.lang.Double.doubleToRawLongBits(v), s"f8 $k")
    }
    // special values survive DML rewrites too (copy-on-write forced)
    e.sql("UPDATE float_rt SET k = concat(k, '!') WHERE k = 'nan'")
    val nan = e.sql("SELECT f4, f8 FROM float_rt WHERE k = 'nan!'").head
    assert(java.lang.Float.isNaN(nan.getFloat(0)))
    assert(java.lang.Double.isNaN(nan.getDouble(1)))
    e.dropTable("float_rt")
  }
}
