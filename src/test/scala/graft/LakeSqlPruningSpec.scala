package graft

import graft.lake.{LakeFileIndex, LakeTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Automatic file pruning through the planner: spark.sql over a
  * registered lake table must hit the LakeFileIndex with the query's
  * own filters — no explicit scan(filter) call.
  */
class LakeSqlPruningSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def scannedFiles(df: DataFrame): Long = {
    df.collect() // execute (finalizes AQE)
    def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          find(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          find(r.child)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(find)
      }
    val scans = find(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("spark.sql filter prunes files via LakeFileIndex") {
    val e = LakeEngine(spark)
    val src = Tables.df(spark, sf, "events")
    val t = LakeTable.createAsSelect(spark, LakeEngine.tempLocation("sqlprune"),
      "ev_sql", src, partitionSpec = Seq("day(ts)"), targetFiles = Some(8))
    t.readIndexed().createOrReplaceTempView("ev_sql")

    val q = spark.sql(
      "SELECT count(*) AS n FROM ev_sql " +
        "WHERE ts >= TIMESTAMP_NTZ '2024-01-20 00:00:00'")
    val files = scannedFiles(q)
    assert(files < 8, s"expected pruning, scanned $files/8 files")

    val expected = src.filter(
      col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp_ntz")).count()
    assert(q.collect().head.getLong(0) == expected)

    // unfiltered view still sees everything
    assert(spark.sql("SELECT count(*) FROM ev_sql").head.getLong(0)
      == src.count())
  }

  test("joins over indexed tables prune each side independently") {
    val src = Tables.df(spark, sf, "events")
    val t = LakeTable.createAsSelect(spark, LakeEngine.tempLocation("sqlprune2"),
      "ev_j", src, partitionSpec = Seq("bucket(8, user_id)"),
      targetFiles = Some(8))
    t.readIndexed().createOrReplaceTempView("ev_j")
    val q = spark.sql(
      "SELECT count(*) AS n FROM ev_j WHERE user_id = 42")
    val files = scannedFiles(q)
    assert(files < 8, s"bucket pruning through SQL: $files/8")
    assert(q.collect().head.getLong(0) ==
      src.filter(col("user_id") === 42).count())
  }

  test("readIndexed falls back after schema evolution") {
    val src = Tables.df(spark, sf, "region")
    val t = LakeTable.createAsSelect(spark, LakeEngine.tempLocation("sqlprune3"),
      "r_evo", src)
    t.renameColumn("r_name", "region_name")
    // rename is metadata-only: old files carry the old schema version,
    // so readIndexed must fall back to the projecting reader
    val df = t.readIndexed()
    assert(df.columns.toSeq == Seq("r_regionkey", "region_name"))
    assert(df.filter(col("region_name") === "ASIA").count() == 1)
  }
}
