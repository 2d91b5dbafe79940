package graft

import graft.lake.{IcebergExport, LakeTable}
import graft.sources.IcebergSnapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg interop roundtrip: LakeTable snapshot → Iceberg v2 metadata
  * (metadata.json + Avro manifests) → external-snapshot scan.
  */
class IcebergInteropSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("export + external read roundtrip preserves rows and schema") {
    val src = Tables.df(spark, sf, "orders")
    val t = LakeTable.createAsSelect(spark, LakeEngine.tempLocation("ice"),
      "orders_ice", src, targetFiles = Some(3))
    val metaPath = IcebergExport.export(t)

    assert(IcebergSnapshot.schemaOf(metaPath).fieldNames.toSeq ==
      src.schema.fieldNames.toSeq)

    val back = IcebergSnapshot.read(spark, metaPath)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)

    val files = IcebergSnapshot.files(spark, metaPath)
    assert(files.count() == 3)
    assert(files.agg(sum("record_count")).head.getLong(0) == src.count())
  }

  test("export after delete reflects the surviving snapshot only") {
    val src = Tables.df(spark, sf, "nation")
    val t = LakeTable.createAsSelect(spark, LakeEngine.tempLocation("ice2"),
      "nation_ice", src)
    t.delete(col("n_nationkey") < 10)
    val metaPath = IcebergExport.export(t)
    val back = IcebergSnapshot.read(spark, metaPath)
    assert(back.count() == src.filter(col("n_nationkey") >= 10).count())
    assert(back.filter(col("n_nationkey") < 10).isEmpty)
  }

  test("partitioned table exports flat and reads back identically") {
    val src = Tables.df(spark, sf, "events")
    val t = LakeTable.createAsSelect(spark, LakeEngine.tempLocation("ice3"),
      "events_ice", src, partitionSpec = Seq("day(ts)"), targetFiles = Some(4))
    val metaPath = IcebergExport.export(t)
    val back = IcebergSnapshot.read(spark, metaPath)
    assert(back.count() == src.count())
    // timestamp_ntz maps through iceberg "timestamp"
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
  }
}
