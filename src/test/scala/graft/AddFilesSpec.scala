package graft

import graft.lake.LakeTable
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zero-copy file adoption — the reference's
  * `CALL lake_iceberg.add_files_to_table(tbl, ARRAY[urls])`
  * (test_iceberg_add_table.py): existing parquet files register in
  * place as a new snapshot, never copied or rewritten. The scale
  * point: bulk migration of existing parquet into a managed table
  * costs one footer read per file.
  */
class AddFilesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  import scala.jdk.CollectionConverters._

  private def onePq(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("addf")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(dir.toString)
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).next()
    finally s.close()
  }

  test("adopted files read, count, time-travel; no copy made") {
    val t = LakeTable.createAsSelect(spark,
      Files.createTempDirectory("addt").toString + "/t", "add_t",
      Seq((0L, "seed")).toDF("id", "v"))
    val preAdd = t.meta.currentSnapshotId

    val f1 = onePq((1L to 10L).map(i => (i, s"a$i")))
    val f2 = onePq((11L to 15L).map(i => (i, s"b$i")))
    t.addFiles(Seq(f1, f2))

    assert(t.read().count() == 16)
    assert(t.read().filter(col("id") === 12).select("v")
      .head.getString(0) == "b12")
    // footer-true row counts in the snapshot entries
    val added = t.meta.currentSnapshot.get.dataFiles
      .filter(f => f.path == f1 || f.path == f2)
    assert(added.map(_.rows).sorted == Seq(5L, 10L))
    // in place: the registered path IS the original file
    assert(added.forall(f => Files.exists(java.nio.file.Paths.get(f.path))))
    // time travel to the pre-add snapshot sees only the seed row
    assert(t.readAsOf(preAdd).count() == 1)
  }

  test("validation: duplicates, non-parquet, schema holes all refuse") {
    val t = LakeTable.createAsSelect(spark,
      Files.createTempDirectory("addv").toString + "/t", "add_v",
      Seq((0L, "seed")).toDF("id", "v"))
    val f1 = onePq(Seq((1L, "x")))
    t.addFiles(Seq(f1))
    // same file twice: reference pkey on (table, file_path)
    val exDup = intercept[Exception](t.addFiles(Seq(f1)))
    assert(exDup.getMessage.contains("already belongs"))
    // non-parquet refused by extension (reference rejects csv/json)
    val csv = Files.createTempFile("addf", ".csv")
    Files.write(csv, "id,v\n1,x\n".getBytes)
    val exCsv = intercept[IllegalArgumentException](
      t.addFiles(Seq(csv.toString)))
    assert(exCsv.getMessage.contains("parquet"))
    // a file missing a table column refuses loudly (a silent cast
    // would null the column out)
    val narrowDir = Files.createTempDirectory("addn")
    Seq(1L, 2L).toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(narrowDir.toString)
    val narrow = {
      val s = Files.list(narrowDir)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).next()
      finally s.close()
    }
    val exCol = intercept[IllegalArgumentException](
      t.addFiles(Seq(narrow)))
    assert(exCol.getMessage.contains("lacks column"))
    // incompatible type refuses (string file column vs bigint table)
    val badDir = Files.createTempDirectory("addb")
    Seq(("one", "x")).toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(badDir.toString)
    val bad = {
      val s = Files.list(badDir)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).next()
      finally s.close()
    }
    val exTy = intercept[IllegalArgumentException](t.addFiles(Seq(bad)))
    assert(exTy.getMessage.contains("cannot be safely read"))
    // nothing partial landed: still exactly 2 rows
    assert(t.read().count() == 2)
  }

  test("bulk adoption (1k files) validates as ONE parallel Spark job") {
    // the 100 TB migration probe: ~1k files must validate via a
    // distributed job over the path list (footer opens on executors),
    // never an O(files) serial driver loop
    val dir = Files.createTempDirectory("addbulk")
    spark.range(0, 1000).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
      .repartition(1000).write.mode("overwrite").parquet(dir.toString)
    val parts = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
    }
    // round-robin repartition leaves some slots empty — anything in
    // the hundreds exercises the distributed path
    assert(parts.size >= 500, s"only ${parts.size} fixture files")

    val t = LakeTable.createAsSelect(spark,
      Files.createTempDirectory("addbt").toString + "/t", "add_bulk",
      Seq((-1L, "seed")).toDF("id", "v"))

    // watch the validation run as a distributed job with many tasks
    val maxTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted)
          : Unit = {
        maxTasks.updateAndGet(m => math.max(m, s.stageInfo.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      t.addFiles(parts)
      // stage-submitted events land synchronously enough for the
      // assert, but give the bus a moment to drain
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(maxTasks.get() >= 4,
      s"validation ran with ${maxTasks.get()} task(s) — looks like a " +
        "driver loop, not a distributed job")
    // every row of every adopted file is readable; counts footer-true
    assert(t.read().count() == 1001)
    val entries = t.meta.currentSnapshot.get.dataFiles
    assert(entries.size == parts.size + 1)
    assert(entries.map(_.rows).sum == 1001)
  }

  test("engine CALL surface: PG spelling with ::regclass and ARRAY[]") {
    val e = LakeEngine(spark)
    e.sql("CREATE TABLE add_sql AS SELECT CAST(id AS BIGINT) AS id, " +
      "concat('r', id) AS v FROM RANGE(0, 3)")
    val f1 = onePq(Seq((100L, "ext1"), (101L, "ext2")))
    val n = e.sql("CALL lake_iceberg.add_files_to_table(" +
      s"'add_sql'::regclass, ARRAY['$f1'])").head.getLong(0)
    assert(n == 1)
    assert(e.sql("SELECT count(*) AS n FROM add_sql").head.getLong(0) == 5)
    assert(e.sql("SELECT v FROM add_sql WHERE id = 101")
      .head.getString(0) == "ext2")
    e.dropTable("add_sql")
  }
}
