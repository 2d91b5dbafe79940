package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.QuantifiedSubqueries.rewrite

/** `op ANY/ALL/SOME (subquery)` expansion — text-level behavior plus
  * end-to-end truth tables through [[QueryDef.pgSql]] against the
  * standard's quantified-comparison semantics (DuckDB's native
  * results for the same shapes pin the differential side via
  * `q_quantified_all` / `q_quantified_any`).
  */
class QuantifiedSubqueriesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def col(sql: String): Seq[Option[Boolean]] =
    QueryDef.pgSql(spark, sql).collect().toSeq.map { r =>
      if (r.isNullAt(r.length - 1)) None else Some(r.getBoolean(r.length - 1))
    }

  test("non-matches pass through byte-identical") {
    for (s <- Seq(
      "SELECT 1 UNION ALL SELECT 2",
      "SELECT count(ALL x) FROM t",
      "SELECT 'op = ANY (SELECT literal inside string)'",
      "SELECT x FROM t -- y = ANY (SELECT z FROM w)\nWHERE x > 0"))
      assert(rewrite(s) eq s, s)
  }

  test("array form: op ANY/ALL (array) maps onto 3VL exists/forall") {
    assert(col("SELECT 3 = ANY (array(1, 2, 3))") === Seq(Some(true)))
    assert(col("SELECT 5 = ANY (array(1, 2, CAST(NULL AS INT)))") === Seq(None))
    assert(col("SELECT 5 > ALL (array(1, 2, CAST(NULL AS INT)))") === Seq(None))
    assert(col("SELECT 0 > ALL (array(1, 2, CAST(NULL AS INT)))")
      === Seq(Some(false)))
    assert(col("SELECT 5 > ALL (array(1, 2))") === Seq(Some(true)))
    // empty array: ANY FALSE, ALL TRUE
    assert(col("SELECT 5 = ANY (array())") === Seq(Some(false)))
    assert(col("SELECT 5 > ALL (array())") === Seq(Some(true)))
    // PG nuance: NULL array yields NULL (DuckDB says FALSE — the PG
    // side of the reference is the contract)
    assert(col("SELECT 5 = ANY (CAST(NULL AS ARRAY<INT>))") === Seq(None))
    // column-valued arrays with a computed probe
    val r = QueryDef.pgSql(spark,
      """SELECT v + 1 = ANY (a) AS m
        |FROM VALUES (1, array(2, 9)), (5, array(2, 9)) s(v, a)
        |ORDER BY v""".stripMargin).collect().map(_.getBoolean(0)).toSeq
    assert(r === Seq(true, false))
  }

  test("ALL truth table: TRUE / FALSE / UNKNOWN / empty-set TRUE") {
    // 2 < ALL {3, NULL} → no false, an unknown → NULL
    assert(col("SELECT 2 < ALL (SELECT x FROM VALUES (3), (CAST(NULL AS INT)) t(x))")
      === Seq(None))
    // 5 < ALL {3, NULL} → 5<3 FALSE wins over the unknown
    assert(col("SELECT 5 < ALL (SELECT x FROM VALUES (3), (CAST(NULL AS INT)) t(x))")
      === Seq(Some(false)))
    // 2 < ALL {3, 4} → TRUE
    assert(col("SELECT 2 < ALL (SELECT x FROM VALUES (3), (4) t(x))")
      === Seq(Some(true)))
    // empty set → TRUE even for a NULL probe
    assert(col("SELECT CAST(NULL AS INT) < ALL (SELECT x FROM VALUES (3) t(x) WHERE x > 99)")
      === Seq(Some(true)))
  }

  test("ANY/SOME truth table") {
    assert(col("SELECT 3 = ANY (SELECT x FROM VALUES (3), (CAST(NULL AS INT)) t(x))")
      === Seq(Some(true)))
    assert(col("SELECT 2 = ANY (SELECT x FROM VALUES (3), (CAST(NULL AS INT)) t(x))")
      === Seq(None))
    assert(col("SELECT 2 = SOME (SELECT x FROM VALUES (3), (4) t(x))")
      === Seq(Some(false)))
    // empty set → FALSE even for a NULL probe
    assert(col("SELECT CAST(NULL AS INT) = ANY (SELECT x FROM VALUES (3) t(x) WHERE x > 99)")
      === Seq(Some(false)))
  }

  test("reference shape: correlated <= ALL in WHERE") {
    // test_cte_subquery_pushdown.py:41's shape on the fixture tables:
    // keep (v, w) rows where w <= every member of a correlated set
    val df = QueryDef.pgSql(spark,
      """SELECT s.v FROM VALUES (1), (2), (3) s(v)
        |WHERE s.v <= ALL (SELECT t.x FROM VALUES (1), (2), (3) t(x)
        |                  WHERE t.x <> s.v)""".stripMargin)
    // v=1: {2,3} → TRUE; v=2: {1,3} → 2<=1 FALSE; v=3: {1,2} → FALSE
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("reference shape: = ANY over an aggregate subquery") {
    val df = QueryDef.pgSql(spark,
      """SELECT v FROM VALUES (1), (7) s(v)
        |WHERE v = ANY (SELECT max(x) FROM VALUES (3), (7) t(x))""".stripMargin)
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(7))
  }

  test("compound left operand and nested quantifiers") {
    // arithmetic LHS: operand scan must take `v + 1`, not just `1`
    assert(col("""SELECT v + 1 >= ALL (SELECT x FROM VALUES (2), (3) t(x))
      FROM VALUES (2) s(v)""") === Seq(Some(true)))
    // two quantified comparisons in one statement
    val df = QueryDef.pgSql(spark,
      """SELECT (1 = ANY (SELECT x FROM VALUES (1) t(x))) AS a,
        |       (2 > ALL (SELECT y FROM VALUES (1) u(y))) AS b""".stripMargin)
    val r = df.collect().head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("VALUES and literals-with-escapes are handled") {
    // (VALUES …) is a query expression in PG — subquery path, not the
    // array-lambda misparse
    assert(col("SELECT 2 = ANY (VALUES (1), (2))") === Seq(Some(true)))
    assert(col("SELECT 5 < ALL (VALUES (6), (7))") === Seq(Some(true)))
    // a backslash-escaped quote inside a literal must not leak SQL
    // into the tokenizer (the remainder would otherwise be rewritten)
    val s = "SELECT 'it\\'s = ANY (SELECT 1)' AS lit"
    assert(rewrite(s) eq s)
    // backtick identifiers are opaque
    val b = "SELECT `a = ANY (SELECT x)` FROM t"
    assert(rewrite(b) eq b)
  }

  test("NOT binds outside the quantified comparison") {
    val df = QueryDef.pgSql(spark,
      """SELECT v FROM VALUES (1), (2) s(v)
        |WHERE NOT v = ANY (SELECT x FROM VALUES (1) t(x))""".stripMargin)
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(2))
  }
}
