package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Columns named after engine-reserved keywords (reference
  * test_duckdb_reserved_keyword_copy.py — issue #277: PIVOT/QUALIFY/
  * LAMBDA/SHOW are legal PG identifiers the engine must carry through
  * COPY and queries without mangling).
  */
class ReservedKeywordSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("reserved-keyword columns survive COPY TO/FROM and queries") {
    val e = LakeEngine(spark)
    Seq((1, 2, 3, 4), (10, 20, 30, 40))
      .toDF("pivot", "qualify", "lambda", "show")
      .createOrReplaceTempView("kw_src")
    val out = Files.createTempDirectory("kw").toString + "/kw.parquet"
    e.sql(s"COPY kw_src TO '$out'")
    val back = e.createLakeTable("kw_back", out)
    assert(back.columns.toSeq == Seq("pivot", "qualify", "lambda", "show"))
    // read back through the engine's SQL surface, filtered on one of
    // the keyword columns
    val r = e.sql(
      "SELECT pivot, show FROM kw_back WHERE qualify = 20 ORDER BY pivot")
    assert(r.collect().map(x => (x.getInt(0), x.getInt(1))).toSeq ==
      Seq((10, 40)))
    // managed-table round trip with a column subset COPY
    val loc = Files.createTempDirectory("kwt").toString + "/t"
    e.createTableAsSelect("kw_tbl", loc, back)
    val csv = Files.createTempDirectory("kwc").toString + "/kw.csv"
    e.sql(s"COPY kw_tbl (pivot, lambda) TO '$csv' WITH (header 'true')")
    val csvBack = e.createLakeTable("kw_csv", csv, format = Some("csv"))
    assert(csvBack.columns.toSeq == Seq("pivot", "lambda"))
    assert(csvBack.count() == 2)
  }
}
