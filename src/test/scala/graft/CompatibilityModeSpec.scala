package graft

import graft.lake._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `compatibility_mode` option layer (reference
  * test_compatibility_mode.py): validated enum, immutable after
  * create, map types rejected up front under 'snowflake'.
  */
class CompatibilityModeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("validated at create; WITH options surface; immutable after") {
    val e = LakeEngine(spark)
    e.sql("CREATE TABLE cm_a (id int4) USING iceberg " +
      s"LOCATION '${LakeEngine.tempLocation("cma")}' " +
      "WITH (compatibility_mode = 'auto')")
    e.sql("CREATE TABLE cm_s (id int4) USING iceberg " +
      s"LOCATION '${LakeEngine.tempLocation("cms")}' " +
      "WITH (compatibility_mode = 'snowflake')")
    assert(e.table("cm_s").meta.properties("compatibility_mode") ==
      "snowflake")
    val bad = intercept[IllegalArgumentException] {
      e.sql("CREATE TABLE cm_bad (id int4) USING iceberg " +
        s"LOCATION '${LakeEngine.tempLocation("cmb")}' " +
        "WITH (compatibility_mode = 'redshift')")
    }
    assert(bad.getMessage.toLowerCase.contains("compatibility_mode"))
    // immutable: changing is rejected, re-stating the same value is a
    // no-op
    val immut = intercept[IllegalArgumentException] {
      e.sql("ALTER TABLE cm_s SET (compatibility_mode 'auto')")
    }
    assert(immut.getMessage.contains("cannot be changed"))
    e.table("cm_s").setProperties(
      Map("compatibility_mode" -> "snowflake")) // no-op, no throw
    // adding it to a table created without is also a change
    intercept[IllegalArgumentException] {
      e.sql("CREATE TABLE cm_plain (id int4) USING iceberg " +
        s"LOCATION '${LakeEngine.tempLocation("cmp")}'")
      e.sql("ALTER TABLE cm_plain SET (compatibility_mode 'snowflake')")
    }
  }

  test("snowflake rejects map columns at create and add-column") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("m", MapType(StringType, IntegerType))))
    val ex = intercept[IllegalArgumentException] {
      LakeTable.create(spark, LakeEngine.tempLocation("cmm"), "t", schema,
        properties = Map("compatibility_mode" -> "snowflake"))
    }
    assert(ex.getMessage.contains("map types cannot be represented"))
    // nested maps are caught too
    val nested = StructType(Seq(StructField("s", StructType(Seq(
      StructField("inner", MapType(StringType, StringType)))))))
    intercept[IllegalArgumentException] {
      LakeTable.create(spark, LakeEngine.tempLocation("cmn"), "t", nested,
        properties = Map("compatibility_mode" -> "snowflake"))
    }
    // add-column guard
    val t = LakeTable.create(spark, LakeEngine.tempLocation("cmo"), "t",
      StructType(Seq(StructField("id", IntegerType))),
      properties = Map("compatibility_mode" -> "snowflake"))
    intercept[IllegalArgumentException] {
      t.addColumn("m", "map<string,int>")
    }
    t.addColumn("ok", "string") // non-map adds still work
    assert(t.meta.sparkSchema.fieldNames.contains("ok"))
  }

  test("WITH (row_ids = 'true') at create enables lineage from birth") {
    import spark.implicits._
    val e = LakeEngine(spark)
    e.sql("CREATE TABLE cm_rid (id int8) USING iceberg " +
      s"LOCATION '${LakeEngine.tempLocation("cmr")}' " +
      "WITH (row_ids = 'true')")
    e.sql("INSERT INTO cm_rid VALUES (10), (20)")
    val t = e.table("cm_rid")
    assert(t.meta.rowIdsEnabled)
    assert(t.readWithRowIds().select("_row_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))
  }
}
