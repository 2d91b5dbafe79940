package graft

import graft.lake.LakeTable
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg/Delta as COPY + DDL-inference SOURCES (reference
  * test_iceberg_copy.py / test_delta_copy.py): `COPY t FROM
  * '<metadata.json>'` (suffix-detected or `format 'iceberg'`),
  * `COPY t FROM '<delta dir>' WITH (format 'delta')`,
  * `definition_from`/`load_from` with the same routing — and COPY TO
  * in either table format refused with the reference's exact message.
  */
class TableFormatCopySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private def icebergMeta(): String = {
    val t = LakeTable.createAsSelect(spark,
      Files.createTempDirectory("tfsrc").toString + "/t", "tf_src",
      Seq((1L, "Amsterdam"), (2L, "Berlin"), (3L, "Cairo"))
        .toDF("id", "city"))
    graft.lake.IcebergExport.export(t)
  }

  test("COPY FROM an iceberg metadata.json, detected and explicit") {
    val meta = icebergMeta()
    val e = LakeEngine(spark)
    e.sql("CREATE TABLE tf_cities (id int8, city text)")
    // suffix-detected
    assert(e.sql(s"COPY tf_cities FROM '$meta'").head.getLong(0) == 3)
    // explicit format
    assert(e.sql(s"COPY tf_cities FROM '$meta' WITH (format 'iceberg')")
      .head.getLong(0) == 3)
    assert(e.sql("SELECT count(*) AS n FROM tf_cities")
      .head.getLong(0) == 6)
    assert(e.sql("SELECT city FROM tf_cities WHERE id = 2 LIMIT 1")
      .head.getString(0) == "Berlin")
    e.dropTable("tf_cities")
  }

  test("load_from / definition_from an iceberg table") {
    val meta = icebergMeta()
    val e = LakeEngine(spark)
    val n = e.sql(s"CREATE TABLE tf_load WITH (load_from = '$meta')")
      .head.getLong(0)
    assert(n == 3)
    assert(e.sql("SELECT max(id) AS m FROM tf_load").head.getLong(0) == 3)
    // definition only: typed empty table
    val n2 = e.sql("CREATE TABLE tf_def WITH " +
      s"(definition_from = '$meta', format = 'iceberg')").head.getLong(0)
    assert(n2 == 0)
    val schema = e.table("tf_def").meta.sparkSchema
    assert(schema.fieldNames.toSeq == Seq("id", "city"))
    e.dropTable("tf_load"); e.dropTable("tf_def")
  }

  test("COPY FROM a delta table dir with format 'delta'") {
    // build a small delta table via our own writer? The repo reads
    // delta externally only, so synthesize the log like DeltaSnapshotSpec
    val dir = Files.createTempDirectory("tfdelta").toString
    Seq((1L, "Bruce", "Lee"), (2L, "Jack", "Ma"))
      .toDF("id", "first_name", "last_name")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val part = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).next()
      finally s.close()
    }
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    val schemaJson =
      """{\"type\":\"struct\",\"fields\":[
        |{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},
        |{\"name\":\"first_name\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}},
        |{\"name\":\"last_name\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
        .stripMargin.replaceAll("\n", "")
    val log =
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"$part","partitionValues":{},"size":${Files.size(java.nio.file.Paths.get(dir, part))},"modificationTime":1,"dataChange":true}}
         |""".stripMargin
    Files.write(logDir.resolve("00000000000000000000.json"),
      log.getBytes("UTF-8"))

    val e = LakeEngine(spark)
    e.sql("CREATE TABLE tf_people (id int8, first_name text, last_name text)")
    assert(e.sql(s"COPY tf_people FROM '$dir' WITH (format 'delta')")
      .head.getLong(0) == 2)
    assert(e.sql("SELECT first_name FROM tf_people WHERE id = 1")
      .head.getString(0) == "Bruce")
    // _delta_log autodetection also routes (an improvement over the
    // reference, which requires the explicit format)
    val n = e.sql(s"CREATE TABLE tf_people2 WITH (load_from = '$dir')")
      .head.getLong(0)
    assert(n == 2)
    e.dropTable("tf_people"); e.dropTable("tf_people2")
  }

  test("COPY TO in a table format refused with the reference message") {
    val meta = icebergMeta()
    val e = LakeEngine(spark)
    e.sql("CREATE TABLE tf_out AS SELECT 1 AS x")
    val ex1 = intercept[IllegalArgumentException](
      e.sql(s"COPY tf_out TO '$meta'"))
    assert(ex1.getMessage.contains(
      "COPY TO in Iceberg format is not supported"))
    val ex2 = intercept[IllegalArgumentException](
      e.sql(s"COPY tf_out TO '/tmp/x' WITH (format 'delta')"))
    assert(ex2.getMessage.contains(
      "COPY TO in Delta format is not supported"))
    val ex3 = intercept[IllegalArgumentException](
      e.sql(s"COPY tf_out TO '/tmp/x' WITH (format 'iceberg')"))
    assert(ex3.getMessage.contains(
      "COPY TO in Iceberg format is not supported"))
    e.dropTable("tf_out")
  }
}
