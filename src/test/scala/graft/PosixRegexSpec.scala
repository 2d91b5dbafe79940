package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PosixRegexRewrite.{groupIndex, rewrite}

/** PG POSIX regex operators (`~ ~* !~ !~*`) and regex SUBSTRING —
  * rewrite shape plus end-to-end PG semantics through
  * [[QueryDef.pgSql]] (DuckDB's `~` is full-match and lacks `~*`, so
  * the judged oracle spells regexp_matches; this spec pins PG
  * behavior directly).
  */
class PosixRegexSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("rewrite shapes: four operators, adjacency, boundaries") {
    assert(rewrite("SELECT x ~ 'a' FROM t")
      .contains("((x) RLIKE concat('(?s)', ('a')))"))
    assert(rewrite("SELECT x ~* 'a' FROM t")
      .contains("concat('(?is)', ('a'))"))
    assert(rewrite("SELECT x !~ 'a' FROM t").contains("(NOT ((x)"))
    val both = rewrite("SELECT a FROM t WHERE x ~ 'p' AND y !~* 'q'")
    assert(both.contains("AND") && both.contains("(?is)"), both)
    // positional SUBSTRING untouched
    val pos = "SELECT SUBSTRING(x FROM 2 FOR 3) FROM t"
    assert(rewrite(pos) eq pos)
    // '~' inside a string literal untouched
    val lit = "SELECT '~' FROM t"
    assert(rewrite(lit) eq lit)
  }

  test("group index: first parenthesized subexpression wins") {
    assert(groupIndex("[0-9]+") === 0)
    assert(groupIndex("a(b)c") === 1)
    assert(groupIndex("a(?:x)(b)") === 1) // non-capturing skipped
    assert(groupIndex("a\\(b") === 0)     // escaped paren is literal
  }

  test("unary bitwise NOT passes through; DOTALL matches newlines") {
    // '~' in prefix position is Spark's bitwise NOT, not a regex op
    val bw = "SELECT ~5 AS x"
    assert(rewrite(bw) eq bw)
    val bw2 = rewrite("SELECT v + ~m AS x FROM t")
    assert(!bw2.contains("RLIKE"), bw2)
    // but infix '~' after a value still rewrites
    assert(rewrite("SELECT a FROM t WHERE n ~ 'x'").contains("RLIKE"))
    // PG's '.' and '%' cross newlines (ARE default); stock Java regex
    // would not without the emitted (?s)
    val r = QueryDef.pgSql(spark,
      "SELECT 'line1\\nline2' ~ 'line1.line2' AS a, " +
        "'line1\\nline2' SIMILAR TO 'line1%' AS b").collect().head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("bracket-class parens are not capture groups") {
    assert(groupIndex("[(][0-9]+[)]") === 0)
    val r = QueryDef.pgSql(spark,
      "SELECT SUBSTRING('x(12)y' FROM '[(][0-9]+[)]') AS m").collect().head
    assert(r.getString(0) === "(12)")
  }

  test("end-to-end: match semantics are PG's substring search") {
    def b(q: String): Option[Boolean] = {
      val r = QueryDef.pgSql(spark, q).collect().head
      if (r.isNullAt(0)) None else Some(r.getBoolean(0))
    }
    assert(b("SELECT 'abc123' ~ '[0-9]+'") === Some(true)) // NOT anchored
    assert(b("SELECT 'abc' ~ '[0-9]+'") === Some(false))
    assert(b("SELECT 'ABC' ~* 'abc'") === Some(true))
    assert(b("SELECT 'abc' !~ 'b'") === Some(false))
    assert(b("SELECT CAST(NULL AS STRING) ~ 'a'") === None)
  }

  test("regex SUBSTRING: whole match, group, NULL on no match") {
    val r = QueryDef.pgSql(spark,
      """SELECT SUBSTRING('abc123xy' FROM '[0-9]+') AS whole,
        |  SUBSTRING('key=value' FROM '=(.*)') AS grp,
        |  SUBSTRING('abc' FROM '[0-9]+') AS miss""".stripMargin)
      .collect().head
    assert(r.getString(0) === "123")
    assert(r.getString(1) === "value")
    assert(r.isNullAt(2), "PG returns NULL on no match")
  }
}
