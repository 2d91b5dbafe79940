package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** PG extract/date_part/date_trunc field completion (reference
  * test_time_functions.py; PG-origin century/millennium trunc per
  * rewrite_query.c:1262). Pins the PG edges the judged differential
  * can't reach: the xx00/xx01 era boundaries (the reference's +1-year
  * rewrite diverges from PG ON xx00 years; we compute the true grid),
  * fractional milliseconds (DuckDB truncates, PG doesn't), and the
  * timezone fields under a non-UTC session zone.
  */
class DatePartsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def one(sql: String): Row = QueryDef.pgSql(spark, sql).head()

  test("century/decade/millennium values: PG era grid incl. xx00 years") {
    val r = one(
      """SELECT
        |  EXTRACT(CENTURY FROM DATE '2019-06-01') AS c19,
        |  EXTRACT(CENTURY FROM DATE '2000-06-01') AS c00,
        |  EXTRACT(CENTURY FROM DATE '2001-06-01') AS c01,
        |  EXTRACT(DECADE FROM DATE '2019-06-01') AS d19,
        |  EXTRACT(MILLENNIUM FROM DATE '2000-06-01') AS m00,
        |  EXTRACT(MILLENNIUM FROM DATE '2001-06-01') AS m01,
        |  DATE_PART('centuries', DATE '1999-01-01') AS plural""".stripMargin)
    assert(r.getLong(0) == 21)
    assert(r.getLong(1) == 20) // 2000 is the LAST year of century 20
    assert(r.getLong(2) == 21)
    assert(r.getLong(3) == 201)
    assert(r.getLong(4) == 2) // 2000 closes millennium 2
    assert(r.getLong(5) == 3)
    assert(r.getLong(6) == 20)
  }

  test("date_trunc era grid: centuries run xx01..(xx+1)00") {
    val r = one(
      """SELECT
        |  CAST(DATE_TRUNC('century', DATE '2019-06-01') AS DATE) AS tc19,
        |  CAST(DATE_TRUNC('century', DATE '2000-06-01') AS DATE) AS tc00,
        |  CAST(DATE_TRUNC('millennium', DATE '2019-06-01') AS DATE) AS tm,
        |  CAST(DATE_TRUNC('decade', DATE '2019-06-01') AS DATE) AS td,
        |  CAST(DATE_TRUNC('year', DATE '2019-06-01') AS DATE) AS ty""".stripMargin)
    assert(r.get(0).toString == "2001-01-01")
    assert(r.get(1).toString == "1901-01-01") // PG: 2000 → 1901, NOT 2001
    assert(r.get(2).toString == "2001-01-01")
    assert(r.get(3).toString == "2010-01-01")
    assert(r.get(4).toString == "2019-01-01") // delegated field intact
  }

  test("isodow/isoyear/epoch/microseconds/milliseconds") {
    val r = one(
      """SELECT
        |  EXTRACT(ISODOW FROM DATE '2019-12-29') AS sunday,
        |  EXTRACT(ISODOW FROM DATE '2019-12-30') AS monday,
        |  EXTRACT(ISOYEAR FROM DATE '2019-12-31') AS iso_fwd,
        |  EXTRACT(ISOYEAR FROM DATE '2021-01-01') AS iso_back,
        |  EXTRACT(EPOCH FROM TIMESTAMP '2020-01-01 00:00:10.5') AS ep,
        |  EXTRACT(MICROSECONDS FROM TIMESTAMP '2020-01-01 00:01:10.5') AS us,
        |  EXTRACT(MILLISECONDS FROM TIMESTAMP '2020-01-01 00:01:10.5004') AS ms""".stripMargin)
    assert(r.getInt(0) == 7)
    assert(r.getInt(1) == 1)
    assert(r.getInt(2) == 2020) // 2019-12-31 is ISO week 1 of 2020
    assert(r.getInt(3) == 2020) // 2021-01-01 is ISO week 53 of 2020
    assert(r.getDouble(4) == 1577836810.5)
    assert(r.getLong(5) == 10500000L)
    assert(r.getDouble(6) == 10500.4) // PG keeps the fraction
  }

  test("epoch of naive timestamps ignores the session zone (PG rule)") {
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
      val r = one(
        """SELECT
          |  EXTRACT(EPOCH FROM CAST('2025-01-01 00:00:00' AS TIMESTAMP_NTZ)) AS e_ntz,
          |  EXTRACT(EPOCH FROM DATE '2025-01-01') AS e_date""".stripMargin)
      // PG: 'without regard to timezone' — the naive value is the UTC
      // instant, NOT shifted by the Berlin session zone
      assert(r.getDouble(0) == 1735689600.0)
      assert(r.getDouble(1) == 1735689600.0)
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("timezone fields track the session zone (SET TIME ZONE GUC)") {
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata") // +05:30
      val r = one(
        """SELECT
          |  EXTRACT(TIMEZONE FROM TIMESTAMP '2020-06-01 00:00:00') AS off,
          |  EXTRACT(TIMEZONE_HOUR FROM TIMESTAMP '2020-06-01 00:00:00') AS h,
          |  EXTRACT(TIMEZONE_MINUTE FROM TIMESTAMP '2020-06-01 00:00:00') AS m""".stripMargin)
      assert(r.getInt(0) == 19800)
      assert(r.getInt(1) == 5)
      assert(r.getInt(2) == 30)
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("unsupported julian refuses loudly; delegation keeps Spark fields") {
    intercept[Exception](one("SELECT EXTRACT(JULIAN FROM DATE '2020-01-01')"))
    val r = one(
      """SELECT EXTRACT(YEAR FROM DATE '2020-03-04') AS y,
        |  EXTRACT(WEEK FROM DATE '2020-03-04') AS w,
        |  DATE_PART('hour', TIMESTAMP '2020-03-04 05:06:07') AS h""".stripMargin)
    assert(r.getInt(0) == 2020 && r.getInt(1) == 10 && r.getInt(2) == 5)
  }
}
