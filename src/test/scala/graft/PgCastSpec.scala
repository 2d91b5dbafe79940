package graft

import org.scalatest.funsuite.AnyFunSuite

/** PG `::type` cast-name compatibility (reference type suites cast
  * this way everywhere: test_int4.py, test_bpchar.py,
  * test_numeric_cast_operators.py).
  */
class PgCastSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import graft.plans.PgCastRewrite.rewrite

  test("type-name mapping, width forms, arrays") {
    assert(rewrite("SELECT 1::int4") == "SELECT 1::int")
    assert(rewrite("SELECT 1::int8 + 2::int2") ==
      "SELECT 1::bigint + 2::smallint")
    assert(rewrite("SELECT x::float4, y::float8 FROM t") ==
      "SELECT x::float, y::double FROM t")
    assert(rewrite("SELECT 'a'::bpchar") == "SELECT 'a'::string")
    assert(rewrite("SELECT a::varchar(10)") == "SELECT a::string")
    assert(rewrite("SELECT a::numeric(10,2)") == "SELECT a::decimal(10,2)")
    assert(rewrite("SELECT a::numeric") == "SELECT a::decimal(38,18)")
    assert(rewrite("SELECT a::bytea") == "SELECT a::binary")
    assert(rewrite("SELECT a::timestamptz, b::timestamp FROM t") ==
      "SELECT a::timestamp_ltz, b::timestamp_ntz FROM t")
    assert(rewrite("SELECT a::int4[]") == "SELECT a::array<int>")
  }

  test("idempotent; Spark names and literals untouched") {
    val done = "SELECT a::double, b::bigint, c::string FROM t"
    assert(rewrite(done) eq done)
    // inside string literals nothing moves
    val lit = "SELECT 'x::int4' AS s"
    assert(rewrite(lit) eq lit)
    // double application is stable
    val once = rewrite("SELECT 1::int4::text")
    assert(rewrite(once) == once && once == "SELECT 1::int::string")
  }

  test("end-to-end: casts run and 3VL/regex rewrites compose") {
    def one(q: String) = QueryDef.pgSql(spark, q).collect().head
    assert(one("SELECT 300::int2 AS v").getShort(0) == 300.toShort)
    assert(one("SELECT '12.50'::numeric(6,2) AS v")
      .getDecimal(0).toString == "12.50")
    assert(one("SELECT ('a '::bpchar = 'a') AS v").getBoolean(0) == false)
    // composes with the POSIX regex rewrite on the same statement
    assert(one("SELECT ('7'::text ~ '[0-9]') AS v").getBoolean(0))
  }
}
