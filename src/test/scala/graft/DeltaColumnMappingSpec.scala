package graft

import graft.sources.DeltaSnapshot
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Delta column mapping read support (`delta.columnMapping.mode` =
  * `name` | `id`) against hand-built spec-conformant tables: physical
  * parquet column names differ from the logical schema, and in `id`
  * mode even the physical names are wrong so only field-id resolution
  * can produce the right values.
  */
class DeltaColumnMappingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def fieldMeta(id: Long, phys: String): Metadata =
    new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys)
      .build()

  private def onlyParquet(dir: String, sub: String): String = {
    val s = Files.list(Paths.get(dir, sub))
    try sub + "/" + s.iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).next()
    finally s.close()
  }

  private def writeLog(dir: String, schema: StructType, mode: String,
      partCols: Seq[String], adds: Seq[(String, Map[String, String])]): Unit = {
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    val schemaString = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val partJson = partCols.map(c => s""""$c"""").mkString("[", ",", "]")
    val addLines = adds.map { case (p, pv) =>
      val pvJson = pv.map { case (k, v) => s""""$k":"$v"""" }
        .mkString("{", ",", "}")
      val size = Files.size(Paths.get(dir, p))
      s"""{"add":{"path":"$p","partitionValues":$pvJson,"size":$size,"modificationTime":0,"dataChange":true}}"""
    }.mkString("\n")
    Files.write(logDir.resolve("0" * 20 + ".json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
          |{"metaData":{"id":"cm","format":{"provider":"parquet"},"schemaString":"$schemaString","partitionColumns":$partJson,"configuration":{"delta.columnMapping.mode":"$mode","delta.columnMapping.maxColumnId":"9"}}}
          |$addLines
          |""".stripMargin).getBytes)
  }

  test("name mode: physical parquet names map back to the logical schema") {
    val dir = Files.createTempDirectory("deltacm_name").toString
    // parquet stores the PHYSICAL names
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("col-11aa", "col-22bb").coalesce(1).write.parquet(s"$dir/f1")
    val p1 = onlyParquet(dir, "f1")

    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, fieldMeta(1, "col-11aa")),
      StructField("name", StringType, nullable = true,
        fieldMeta(2, "col-22bb"))))
    writeLog(dir, logical, "name", Nil, Seq(p1 -> Map.empty))

    val back = DeltaSnapshot.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    assert(DeltaSnapshot.schemaOf(spark, dir).fieldNames.toSeq ==
      Seq("id", "name"))
  }

  test("name mode: partition reconstruction with physical partitionValues keys") {
    val dir = Files.createTempDirectory("deltacm_part").toString
    Seq((1L, "a1"), (2L, "a2")).toDF("col-id", "col-v").coalesce(1)
      .write.parquet(s"$dir/part0")
    Seq((3L, "b1")).toDF("col-id", "col-v").coalesce(1)
      .write.parquet(s"$dir/part1")
    val (p1, p2) = (onlyParquet(dir, "part0"), onlyParquet(dir, "part1"))

    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, fieldMeta(1, "col-id")),
      StructField("v", StringType, nullable = true, fieldMeta(2, "col-v")),
      StructField("bucket", StringType, nullable = true,
        fieldMeta(3, "col-bk"))))
    // per the protocol, add.partitionValues keys are PHYSICAL names
    writeLog(dir, logical, "name", Seq("bucket"),
      Seq(p1 -> Map("col-bk" -> "a"), p2 -> Map("col-bk" -> "b")))

    val back = DeltaSnapshot.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v", "bucket"))
    assert(back.filter(col("bucket") === "b").select("id")
      .as[Long].collect().toSeq == Seq(3L))
    assert(back.count() == 3)
    // partition filter prunes through the FileIndex at plan time: the
    // executed scan reads one file, not two
    val pruned = back.filter(col("bucket") === "a")
    pruned.collect()
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.totalNumberOfFiles
    }.sum
    assert(scanned == 1, s"expected 1 scanned file, got $scanned")
  }

  test("name mode: nested struct fields rename through the cast path") {
    val dir = Files.createTempDirectory("deltacm_nested").toString
    Seq((1L, (10L, "x")), (2L, (20L, "y")))
      .toDF("col-k", "col-s")
      .select(col("col-k"), col("col-s").cast(
        StructType(Seq(StructField("col-n1", LongType),
          StructField("col-n2", StringType)))).as("col-s"))
      .coalesce(1).write.parquet(s"$dir/f1")
    val p1 = onlyParquet(dir, "f1")

    val nested = StructType(Seq(
      StructField("qty", LongType, nullable = true, fieldMeta(4, "col-n1")),
      StructField("tag", StringType, nullable = true,
        fieldMeta(5, "col-n2"))))
    val logical = StructType(Seq(
      StructField("k", LongType, nullable = true, fieldMeta(1, "col-k")),
      StructField("s", nested, nullable = true, fieldMeta(2, "col-s"))))
    writeLog(dir, logical, "name", Nil, Seq(p1 -> Map.empty))

    val back = DeltaSnapshot.read(spark, dir)
    assert(back.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("qty", "tag"))
    assert(back.orderBy("k").select("s.qty", "s.tag")
      .as[(Long, String)].collect().toSeq == Seq((10L, "x"), (20L, "y")))
  }

  test("id mode: resolution is by parquet field id, not by name") {
    val dir = Files.createTempDirectory("deltacm_id").toString
    // Parquet columns are named NOTHING like the physicalNames, but
    // carry matching field ids — exactly the cross-engine case id mode
    // exists for. Spark writes the ids when the write schema carries
    // `parquet.field.id` metadata (fieldId.write.enabled defaults on).
    def pqMeta(id: Long): Metadata =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    Seq((7L, "seven"), (8L, "eight")).toDF("x", "y")
      .select(col("x").as("x", pqMeta(1)), col("y").as("y", pqMeta(2)))
      .coalesce(1).write.parquet(s"$dir/f1")
    val p1 = onlyParquet(dir, "f1")

    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, fieldMeta(1, "col-zz")),
      StructField("label", StringType, nullable = true,
        fieldMeta(2, "col-ww"))))
    writeLog(dir, logical, "id", Nil, Seq(p1 -> Map.empty))

    val back = DeltaSnapshot.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "label"))
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((7L, "seven"), (8L, "eight")))
  }

  test("unknown mapping mode still refuses loudly") {
    val dir = Files.createTempDirectory("deltacm_bad").toString
    Seq((1L, "a")).toDF("c1", "c2").coalesce(1).write.parquet(s"$dir/f1")
    val p1 = onlyParquet(dir, "f1")
    val logical = StructType(Seq(
      StructField("c1", LongType), StructField("c2", StringType)))
    writeLog(dir, logical, "wat", Nil, Seq(p1 -> Map.empty))
    val e = intercept[IllegalArgumentException] {
      DeltaSnapshot.read(spark, dir)
    }
    assert(e.getMessage.contains("columnMapping"))
  }
}
