package graft

import graft.sources.DeltaSnapshot
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta-log replay against a hand-built (spec-conformant) table:
  * two commits with add/remove actions over real parquet files.
  */
class DeltaSnapshotSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("delta log replay: add/remove across commits") {
    val src = Tables.df(spark, sf, "region")
    val dir = Files.createTempDirectory("delta").toString

    // two data files written as plain parquet
    src.filter(col("r_regionkey") < 3).coalesce(1)
      .write.parquet(s"$dir/f1")
    src.filter(col("r_regionkey") >= 3).coalesce(1)
      .write.parquet(s"$dir/f2")
    def partFile(sub: String): String = {
      val s = Files.list(Paths.get(dir, sub))
      try sub + "/" + s.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).next()
      finally s.close()
    }
    val (p1, p2) = (partFile("f1"), partFile("f2"))

    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    val schemaString = src.schema.json.replace("\"", "\\\"")
    Files.write(logDir.resolve("0" * 20 + ".json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
          |{"metaData":{"id":"t1","format":{"provider":"parquet"},"schemaString":"$schemaString","partitionColumns":[],"configuration":{}}}
          |{"add":{"path":"$p1","size":1,"modificationTime":0,"dataChange":true}}
          |""".stripMargin).getBytes)

    // commit 1: full table = f1 only
    assert(DeltaSnapshot.read(spark, dir).count() ==
      src.filter(col("r_regionkey") < 3).count())

    // commit 2: remove f1, add f2
    Files.write(logDir.resolve("0" * 19 + "1.json"),
      (s"""{"remove":{"path":"$p1","dataChange":true}}
          |{"add":{"path":"$p2","size":1,"modificationTime":0,"dataChange":true}}
          |""".stripMargin).getBytes)

    val back = DeltaSnapshot.read(spark, dir)
    assert(back.count() == src.filter(col("r_regionkey") >= 3).count())
    assert(back.schema.fieldNames.toSeq == src.schema.fieldNames.toSeq)
    assert(DeltaSnapshot.schemaOf(spark, dir) == src.schema)

    // facade registration
    val e = LakeEngine(spark)
    e.createDeltaTable("delta_region", dir)
    assert(spark.sql("SELECT count(*) FROM delta_region").head.getLong(0) ==
      back.count())
  }

  test("checkpoint replay over a cleaned log + partition reconstruction") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("deltacp").toString
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)

    // data files WITHOUT the partition column (delta stores it in the
    // path / partitionValues only)
    import spark.implicits._
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name").coalesce(1)
      .write.parquet(s"$dir/p=a/f1")
    Seq((3L, "gamma")).toDF("id", "name").coalesce(1)
      .write.parquet(s"$dir/p=b/f2")
    def partFile(sub: String): String = {
      val s = Files.list(Paths.get(dir, sub))
      try sub + "/" + s.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).next()
      finally s.close()
    }
    val (p1, p2) = (partFile("p=a/f1"), partFile("p=b/f2"))
    // the protocol requires add.size to be the REAL file length — the
    // single-scan FileIndex hands it to the parquet reader as the split
    // bound, so a lying size would truncate the scan
    val (s1, s2) = (Files.size(Paths.get(dir, p1)), Files.size(Paths.get(dir, p2)))

    val tableSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("p", StringType)))

    // checkpoint at version 1: metaData + the f1 add (as if versions
    // 0..1 were compacted); versions 0..1 JSON already "cleaned" away
    val cp = spark.sql(
      s"""SELECT named_struct('path', '$p1',
         |  'partitionValues', map('p', 'a'),
         |  'size', ${s1}L, 'modificationTime', 0L, 'dataChange', true) AS add,
         |  CAST(NULL AS STRUCT<schemaString: STRING,
         |    partitionColumns: ARRAY<STRING>,
         |    configuration: MAP<STRING, STRING>>) AS metaData
         |UNION ALL
         |SELECT NULL,
         |  named_struct('schemaString', '${tableSchema.json.replace("'", "''")}',
         |    'partitionColumns', array('p'),
         |    'configuration', map())""".stripMargin)
    cp.coalesce(1).write.parquet(s"$logDir/cp_tmp")
    val cpFile = {
      val s = Files.list(Paths.get(s"$logDir/cp_tmp"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).next()
      finally s.close()
    }
    Files.move(Paths.get(s"$logDir/cp_tmp/$cpFile"),
      logDir.resolve("0" * 19 + "1.checkpoint.parquet"))
    Files.write(logDir.resolve("_last_checkpoint"),
      """{"version":1,"size":2}""".getBytes)

    // version 2 JSON on top: add f2 (partition p=b)
    Files.write(logDir.resolve("0" * 19 + "2.json"),
      (s"""{"add":{"path":"$p2","partitionValues":{"p":"b"},"size":$s2,"modificationTime":0,"dataChange":true}}
          |""".stripMargin).getBytes)

    val back = DeltaSnapshot.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "p"))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq((1L, "alpha", "a"), (2L, "beta", "a"),
      (3L, "gamma", "b")))
    // partition reconstruction must not cost one scan per tuple: the
    // whole table plans as a SINGLE FileScan node
    assert(back.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.size == 1, "partitioned delta read should be one scan node")
    // partition filters prune at the index (only p=b files survive)
    val pruned = DeltaSnapshot.read(spark, dir).filter(col("p") === "b")
    assert(pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head.inputRDDs().map(_.partitions.length).sum <= 1)
    assert(pruned.count() == 1)

    // a declared multi-part checkpoint with a missing part must refuse
    Files.write(logDir.resolve("_last_checkpoint"),
      """{"version":1,"size":2,"parts":2}""".getBytes)
    intercept[IllegalArgumentException] { DeltaSnapshot.read(spark, dir) }
    Files.write(logDir.resolve("_last_checkpoint"),
      """{"version":1,"size":2}""".getBytes)

    // a gap AFTER the checkpoint must refuse, not silently drop
    Files.write(logDir.resolve("0" * 19 + "4.json"),
      """{"add":{"path":"nope.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""".getBytes)
    intercept[IllegalArgumentException] { DeltaSnapshot.read(spark, dir) }
    Files.delete(logDir.resolve("0" * 19 + "4.json"))

    // no checkpoint + log not from 0 must refuse
    Files.delete(logDir.resolve("_last_checkpoint"))
    intercept[IllegalArgumentException] { DeltaSnapshot.read(spark, dir) }
  }
}
