package graft

import graft.plans.RowCompareRewrite
import org.scalatest.funsuite.AnyFunSuite

/** PG row-wise comparisons (reference test_select_expressions.py; PG
  * docs §9.24.5): the SQL-standard lexicographic expansion, with the
  * standard's three-valued results.
  */
class RowCompareSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("rewrite shapes: fires on both-sides ROW, leaves the rest") {
    assert(RowCompareRewrite.rewrite("SELECT ROW(a, b) = ROW(1, 2)") ==
      "SELECT ((a) = (1) AND (b) = (2))")
    assert(RowCompareRewrite.rewrite("SELECT ROW(a, b) < ROW(c, d)") ==
      "SELECT ((a) < (c) OR ((a) = (c) AND ((b) < (d))))")
    // constructor without a comparison stays for the row() function
    val c = "SELECT ROW(a, b) AS r FROM t"
    assert(RowCompareRewrite.rewrite(c) == c)
    // literals never match
    val l = "SELECT 'ROW(a) = ROW(b)'"
    assert(RowCompareRewrite.rewrite(l) == l)
    // arity mismatch refuses like PG
    val e = intercept[IllegalArgumentException] {
      RowCompareRewrite.rewrite("SELECT ROW(a) = ROW(1, 2)")
    }
    assert(e.getMessage.contains("unequal number of entries"))
  }

  test("three-valued results match PG") {
    val e = LakeEngine(spark)
    def one(expr: String): Any = {
      val r = e.sql(s"SELECT $expr AS v").first()
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    assert(one("ROW(1, 2) > ROW(1, 1)") == true)
    assert(one("ROW(1, 2) > ROW(1, 2)") == false)
    assert(one("ROW(1, 2) >= ROW(1, 2)") == true)
    // a decided earlier column short-circuits past a later NULL
    assert(one("ROW(1, NULL) < ROW(2, 0)") == true)
    // an undecided earlier column with a NULL tail is unknown
    assert(one("ROW(1, NULL) = ROW(1, 2)") == null)
    assert(one("ROW(0, NULL) = ROW(1, 2)") == false)
    assert(one("ROW(1, NULL) <> ROW(1, 2)") == null)
    assert(one("ROW(0, NULL) <> ROW(1, 2)") == true)
    // mixed types compare element-wise (the case Spark's struct
    // comparison refuses outright)
    assert(one("ROW(1, 'b') < ROW(2, 'a')") == true)
    // PG's any-pair-decides rule for row =/<> (PG docs §9.24.5: rows
    // are unequal if ANY corresponding members are non-null and
    // unequal) — probed: DuckDB diverges here (strict lexicographic
    // NULL short-circuit answers NULL for both), which is why the
    // rowcmp fuzz keeps NULLIF elements out of its =/<> draws
    assert(one("ROW(NULL, 1) <> ROW('a', 2)") == true)
    assert(one("ROW(NULL, 1) = ROW('a', 2)") == false)
  }
}
