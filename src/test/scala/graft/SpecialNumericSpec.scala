package graft

import org.scalatest.funsuite.AnyFunSuite

/** Special numeric values across the storage type map (reference
  * test_special_numeric.py + test_unbounded_numeric.py):
  *  - unbounded `numeric` and precision > 38 store as DOUBLE, which
  *    accepts NaN/±Inf;
  *  - bounded numeric is DECIMAL: NaN/±Inf error under the
  *    out_of_range_values='error' default ("NaN is not supported for
  *    Iceberg decimal") and clamp to NULL under 'clamp' — never a
  *    silent NULL.
  */
class SpecialNumericSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("unbounded numeric and numeric(50,2) store as double") {
    val e = LakeEngine(spark)
    e.sql("CREATE TABLE sn_u (b numeric) USING iceberg " +
      s"LOCATION '${LakeEngine.tempLocation("snu")}'")
    e.sql("CREATE TABLE sn_l (b numeric(50,2)) USING iceberg " +
      s"LOCATION '${LakeEngine.tempLocation("snl")}'")
    assert(e.table("sn_u").meta.sparkSchema("b").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(e.table("sn_l").meta.sparkSchema("b").dataType ==
      org.apache.spark.sql.types.DoubleType)
    e.sql("INSERT INTO sn_u VALUES ('Infinity'), ('NaN'), ('-Infinity')")
    val vs = e.sql("SELECT b FROM sn_u ORDER BY b")
      .as[Double].collect()
    assert(vs(0) == Double.NegativeInfinity)
    assert(vs(1) == Double.PositiveInfinity || vs(1).isNaN)
    assert(vs.exists(_.isNaN) && vs.exists(_ == Double.PositiveInfinity))
  }

  test("bounded numeric: NaN errors by default, clamps to NULL") {
    val e = LakeEngine(spark)
    e.sql("CREATE TABLE sn_err (b numeric(20,10)) USING iceberg " +
      s"LOCATION '${LakeEngine.tempLocation("sne")}'")
    assert(e.table("sn_err").meta.sparkSchema("b").dataType ==
      org.apache.spark.sql.types.DecimalType(20, 10))
    val ex = intercept[Exception] {
      e.sql("INSERT INTO sn_err VALUES ('NaN')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("NaN is not supported")), msgs(ex))

    e.sql("CREATE TABLE sn_clamp (b numeric(20,10)) USING iceberg " +
      s"LOCATION '${LakeEngine.tempLocation("snc")}'")
    e.sql("ALTER TABLE sn_clamp SET (out_of_range_values 'clamp')")
    e.sql("INSERT INTO sn_clamp VALUES ('NaN'), ('1.5')")
    val rows = e.sql("SELECT b FROM sn_clamp ORDER BY b NULLS FIRST")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDecimal(0).doubleValue() == 1.5)
  }
}
