package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's PG-compat SQL suite
  * (`pg_lake_table/tests/pytests/test_postgres_compat_sql.py`)
  * replayed against the engine's SQL surface on the same 5-row
  * fixture it builds (`id` 1..5, `value` NULL for id ≤ 3 else
  * `id*100` as text). Each shape asserts the PG result.
  */
class PgCompatSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def fixture(): Unit = {
    QueryDef.pgSql(spark,
      """CREATE OR REPLACE TEMP VIEW compat_t AS
        |SELECT id, CASE WHEN id > 3 THEN CAST(id * 100 AS STRING) END AS value
        |FROM range(1, 6) r(id)""".stripMargin)
    ()
  }

  private def sql(q: String) = QueryDef.pgSql(spark, q)

  test("projection, row constructor, CASE, concat, coalesce") {
    fixture()
    assert(sql("SELECT t1.* FROM compat_t AS t1 ORDER BY 1").count() === 5)
    val rows = sql("SELECT row(id, value) AS r FROM compat_t ORDER BY 1")
      .collect()
    assert(rows.length === 5 && rows.head.getStruct(0).getLong(0) === 1L)
    assert(sql("""SELECT id, CASE WHEN id > 3 THEN 'High' ELSE 'Low' END
      AS c FROM compat_t ORDER BY 1""").collect()
      .map(_.getString(1)).toSeq === Seq("Low", "Low", "Low", "High", "High"))
    // || with NULL → NULL (PG)
    val info = sql("""SELECT 'Name: ' || value || ', Age: ' || id AS u
      FROM compat_t ORDER BY id""").collect()
    assert(info.take(3).forall(_.isNullAt(0)) &&
      info(3).getString(0) === "Name: 400, Age: 4")
    assert(sql("""SELECT COALESCE(value, 'No description provided.') AS v
      FROM compat_t ORDER BY id""").collect().head.getString(0)
      === "No description provided.")
  }

  test("set-returning generate_series: FROM position and select list") {
    fixture()
    // FROM t, generate_series(0,10) g(s) WHERE s = id
    val j = sql("""SELECT id, s FROM compat_t, generate_series(0, 10) AS g(s)
      WHERE s = id ORDER BY 1""").collect()
    assert(j.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // JOIN ... ON form
    assert(sql("""SELECT id, s FROM compat_t
      JOIN generate_series(1, 2) AS g(s) ON s = id ORDER BY 1""")
      .count() === 2)
    // SRF in the select list cross-joins against each row (PG shape:
    // SELECT generate_series(1,10) AS series, * FROM t)
    assert(sql("""SELECT generate_series(1, 10) AS series, id
      FROM compat_t ORDER BY 1, 2""").count() === 50)
  }

  test("unnest and ARRAY[...] literals in FROM, projections, quantifiers") {
    fixture()
    val u = sql("""SELECT id, s FROM compat_t
      JOIN unnest(ARRAY[1, 2]) AS g(s) ON s = id ORDER BY 1""").collect()
    assert(u.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(sql("""SELECT DISTINCT id FROM compat_t
      JOIN unnest(ARRAY[1, 2]) AS g(id) USING (id) ORDER BY 1""")
      .count() === 2)
    val arr = sql("""SELECT ARRAY[id] AS a, ARRAY[s] AS b
      FROM compat_t, generate_series(0, 10) AS g(s)
      WHERE s = id ORDER BY 1""").collect()
    assert(arr.length === 5 && arr.head.getSeq[Long](0) === Seq(1L))
    // = any(array[1,2,3]) — the ScalarArrayOpExpr form composed with
    // the ARRAY literal shim
    assert(sql("""SELECT id FROM compat_t
      WHERE id = any(ARRAY[1, 2, 3]) ORDER BY 1""").count() === 3)
    // nested constructor
    assert(sql("SELECT ARRAY[ARRAY[1, 2], ARRAY[3, 4]] AS m").collect()
      .head.getSeq[Seq[Int]](0).length === 2)
  }

  test("VALUES joins, LATERAL correlated aggregate, IS NULL projection") {
    fixture()
    assert(sql("""SELECT id, s FROM compat_t, (VALUES (1), (2)) AS g(s)
      WHERE s = id ORDER BY 1""").count() === 2)
    assert(sql("""SELECT DISTINCT id FROM compat_t
      JOIN (VALUES (1), (2)) AS g(id) USING (id) ORDER BY 1""").count() === 2)
    val lat = sql("""SELECT t1.id, t2.aggregated_value FROM compat_t t1,
      LATERAL (SELECT SUM(id) AS aggregated_value FROM compat_t t2
               WHERE t2.id = t1.id) t2 ORDER BY 1""").collect()
    assert(lat.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(sql("""SELECT id, (value IS NULL) AS active FROM compat_t
      ORDER BY 1""").collect().count(_.getBoolean(1)) === 3)
  }

  test("failure compat: division by zero raises, like PG") {
    // the suite's failure half asserts fdw and heap THROW identically;
    // Spark 4 runs ANSI by default, so id/0 raises rather than
    // returning NULL — the PG-compatible posture
    fixture()
    val e = intercept[Exception] {
      sql("SELECT id/0 AS x FROM compat_t").collect()
    }
    assert(e.getMessage.toUpperCase.contains("DIVIDE_BY_ZERO") ||
      e.getMessage.toLowerCase.contains("division by zero"), e.getMessage)
  }

  test("SIMILAR TO gate from the compat suite") {
    fixture()
    // CASE WHEN value SIMILAR TO '%(SQL|PostgreSQL)%' — NULL value
    // makes SIMILAR TO NULL, so the CASE falls to ELSE (PG behavior)
    val m = sql("""SELECT id, CASE WHEN value SIMILAR TO '%(00|700)%'
      THEN TRUE ELSE FALSE END AS matches FROM compat_t ORDER BY 1""")
      .collect()
    assert(m.map(_.getBoolean(1)).toSeq ===
      Seq(false, false, false, true, true))
  }

  test("DDL accepts the SURVEY §1.2 PG type conventions") {
    // time/timetz → micros-of-day BIGINT; uuid/json/jsonb → string;
    // bytea → binary — the reference's type suites declare columns in
    // these spellings (operator_pushdown/test_time/timetz/bytea/json)
    import org.apache.spark.sql.types._
    val e = LakeEngine(SparkTestSession.spark)
    e.sql("CREATE TABLE conv_t (t time, tz timetz, u uuid, " +
      "j jsonb, b bytea)")
    val s = e.table("conv_t").meta.sparkSchema
    assert(s("t").dataType == LongType && s("tz").dataType == LongType)
    assert(s("u").dataType == StringType && s("j").dataType == StringType)
    assert(s("b").dataType == BinaryType)
    e.sql("INSERT INTO conv_t VALUES (45296000000, 0, " +
      "'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11', '{\"k\":1}', " +
      "CAST('ab' AS BINARY))")
    val r = e.sql("SELECT t, u, j ->> 'k' AS k FROM conv_t").head
    assert(r.getLong(0) == 45296000000L)
    assert(r.getString(1).startsWith("a0eebc99"))
    assert(r.getString(2) == "1")
    e.dropTable("conv_t")
  }

  /** to_char's computed fields (no working Java pattern in Spark ≥3):
    * ISO-8601 year/week/dow boundary pins straight from the PG docs,
    * plus PG's day-of-year-based WW/W and Sunday-1 D.
    */
  test("to_char ISO and week fields: boundary pins") {
    val e = LakeEngine(spark)
    def tc(date: String, fmt: String): String =
      e.sql(s"SELECT to_char('$date'::date::timestamp, '$fmt') AS v")
        .head.getString(0)
    // 2023-01-01 is a SUNDAY: ISO week 52 of ISO year 2022
    assert(tc("2023-01-01", "IYYY-IW-ID") == "2022-52-7")
    // 2024-01-01 is a MONDAY: ISO week 1 of 2024
    assert(tc("2024-01-01", "IYYY-IW-ID") == "2024-01-1")
    // 2024-12-30 (Monday) already belongs to ISO 2025 week 1
    assert(tc("2024-12-30", "IYYY-IW") == "2025-01")
    // PG WW/W are day-of-year arithmetic, not calendar weeks
    assert(tc("2024-01-01", "WW") == "01")
    assert(tc("2024-12-31", "WW") == "53") // (366-1)/7+1
    assert(tc("2024-01-08", "W") == "2")   // (8-1)/7+1
    // D is Sunday=1 (2023-01-01 Sunday, 2024-01-01 Monday)
    assert(tc("2023-01-01", "D") == "1")
    assert(tc("2024-01-01", "D") == "2")
    // composed with pattern spans and literals on both sides
    assert(tc("2024-01-01", "YYYY\"w\"IW-DD") == "2024w01-01")
  }
}
