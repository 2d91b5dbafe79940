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
    assert(DeltaSnapshot.schemaOf(dir) == src.schema)

    // facade registration
    val e = LakeEngine(spark)
    e.createDeltaTable("delta_region", dir)
    assert(spark.sql("SELECT count(*) FROM delta_region").head.getLong(0) ==
      back.count())
  }
}
