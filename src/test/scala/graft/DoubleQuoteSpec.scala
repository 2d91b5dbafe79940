package graft

import org.scalatest.funsuite.AnyFunSuite

/** PG double-quoted identifiers (reference
  * test_duckdb_reserved_keywords.py; its deparser quotes every name)
  * mapped onto Spark backticks by [[graft.plans.DoubleQuoteRewrite]].
  */
class DoubleQuoteSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("quoted identifiers in select/where/order, reserved words, spaces") {
    val df = QueryDef.pgSql(spark,
      """SELECT "v" AS "select", "v" * 2 AS "two words"
        |FROM (SELECT 3 AS v) "t"
        |WHERE "t"."v" > 1
        |ORDER BY "select"""".stripMargin)
    assert(df.columns.toSeq == Seq("select", "two words"))
    val r = df.head
    assert(r.getInt(0) == 3 && r.getInt(1) == 6)
  }

  test("doubled quotes unescape; strings with quotes survive") {
    val df = QueryDef.pgSql(spark,
      """SELECT 1 AS "a""b", 'he said "hi" -- not a comment' AS s""")
    assert(df.columns.toSeq == Seq("a\"b", "s"))
    assert(df.head.getString(1) == "he said \"hi\" -- not a comment")
  }

  test("quoted type names in PG casts (the deparser's ::\"int4\" form)") {
    val r = QueryDef.pgSql(spark,
      """SELECT 7::"int4" AS a, '2020-01-02'::"date" AS b,
        |  3.5::"numeric"(10,1) AS c""".stripMargin).head
    assert(r.getInt(0) == 7)
    assert(r.get(1).toString == "2020-01-02")
    assert(r.getDecimal(2).toPlainString == "3.5")
  }

  test("COLLATE with quoted names still strips after the rewrite") {
    val df = QueryDef.pgSql(spark,
      """SELECT "v" FROM (SELECT 'x' AS v) t ORDER BY "v" COLLATE "C"""")
    assert(df.head.getString(0) == "x")
  }

  test("json arrows compose with quoted columns") {
    val r = QueryDef.pgSql(spark,
      """SELECT "j" ->> 'k' AS v FROM (SELECT '{"k":5}' AS j) t""").head
    assert(r.getString(0) == "5")
  }
}
