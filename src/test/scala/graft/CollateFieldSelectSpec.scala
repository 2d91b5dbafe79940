package graft

import org.scalatest.funsuite.AnyFunSuite

/** PG COLLATE clauses (reference test_collate.py — byte-order
  * collations strip before shipping, exactly like the reference's
  * assert_remote_query_not_contains_collate) and PG composite field
  * selection `(col).field` (test_fieldselect_pushdown.py — Spark's
  * parser handles the parenthesized dereference natively; pinned so a
  * parser change can't silently drop the surface).
  */
class CollateFieldSelectSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("byte-order collations strip: C, POSIX, ucs_basic, default") {
    val df = QueryDef.pgSql(spark,
      """SELECT v FROM (SELECT 'b' AS v UNION ALL SELECT 'A' UNION ALL
        |  SELECT 'a') t
        |WHERE v COLLATE "C" >= 'A' COLLATE "C"
        |ORDER BY v COLLATE "POSIX"""".stripMargin)
    // byte order: 'A'(65) < 'a'(97) < 'b'(98) — all pass the filter
    assert(df.collect().map(_.getString(0)).toSeq == Seq("A", "a", "b"))
    val d2 = QueryDef.pgSql(spark,
      "SELECT 'x' COLLATE ucs_basic AS a, 'y' COLLATE \"default\" AS b")
    assert(d2.head.getString(0) == "x" && d2.head.getString(1) == "y")
  }

  test("concatenation operand keeps PG precedence under COLLATE") {
    val df = QueryDef.pgSql(spark,
      """SELECT v FROM (SELECT 'b' AS v UNION ALL SELECT 'a') t
        |ORDER BY v || '-' || v COLLATE "POSIX" DESC""".stripMargin)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("b", "a"))
  }

  test("locale-aware collations refuse loudly") {
    val e = intercept[IllegalArgumentException](QueryDef.pgSql(spark,
      """SELECT 'a' COLLATE "en_US" AS v"""))
    assert(e.getMessage.contains("en_US"))
  }

  test("identifier named collate elsewhere survives") {
    val df = QueryDef.pgSql(spark,
      "SELECT collate + 1 AS v FROM (SELECT 2 AS collate) t")
    assert(df.head.getInt(0) == 3)
  }

  test("(composite).field selects, nested and in WHERE (PG fieldselect)") {
    val df = QueryDef.pgSql(spark,
      """SELECT (p).x AS vx, ((q).a).b AS vb
        |FROM (SELECT named_struct('x', 1, 'y', 2) AS p,
        |             named_struct('a', named_struct('b', 7)) AS q) t
        |WHERE (p).x = 1 AND 5 < ((q).a).b""".stripMargin)
    val r = df.head
    assert(r.getInt(0) == 1 && r.getInt(1) == 7)
  }
}
