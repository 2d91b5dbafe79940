package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine SQL statement surfaces beyond relational queries: views
  * (reference test_view_pushdown.py), SET/SHOW/RESET with the
  * timezone GUC (test_timezone.py, test_settings.py), and EXPLAIN
  * (test_explain.py).
  */
class EngineSqlSurfaceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def engine(tag: String): LakeEngine = {
    val e = LakeEngine(spark)
    val src = Tables.df(spark, sf, "region")
    e.createTableAsSelect(s"reg_$tag", LakeEngine.tempLocation(tag), src)
    e
  }

  test("RESET restores the live spark conf; EXPLAIN tolerates RETURNING") {
    val e = engine("rst")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    e.sql("SET spark.sql.shuffle.partitions = 7")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    e.sql("RESET spark.sql.shuffle.partitions")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    e.sql("SET spark.sql.shuffle.partitions = 9")
    e.sql("RESET ALL")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    // EXPLAIN [ANALYZE] of DML with RETURNING: plan text / real count
    val plan = e.sql(
      "EXPLAIN DELETE FROM reg_rst WHERE r_regionkey = 1 RETURNING r_name")
    assert(plan.collect().exists(_.getString(0).contains("Statement: DELETE")))
    assert(e.sql("SELECT count(*) AS n FROM reg_rst").head.getLong(0) == 5)
    val an = e.sql(
      "EXPLAIN ANALYZE DELETE FROM reg_rst WHERE r_regionkey = 1 RETURNING r_name")
    assert(an.collect().exists(_.getString(0) == "Rows affected: 1"))
    assert(e.sql("SELECT count(*) AS n FROM reg_rst").head.getLong(0) == 4)
  }

  test("COLLATE pg_catalog qualification strips like the bare form") {
    val df = QueryDef.pgSql(spark,
      """SELECT v FROM (SELECT 'a' AS v) t
        |ORDER BY v COLLATE pg_catalog."C"""".stripMargin)
    assert(df.head.getString(0) == "a")
  }

  test("views see post-DML table state; view-on-view; OR REPLACE; DROP") {
    val e = engine("v1")
    e.sql("CREATE VIEW v_top AS SELECT r_regionkey, r_name FROM reg_v1 " +
      "WHERE r_regionkey >= 2")
    e.sql("CREATE VIEW v_cnt AS SELECT count(*) AS n FROM v_top")
    assert(e.sql("SELECT * FROM v_cnt").head.getLong(0) == 3)
    // DML moves the snapshot; the view definition re-applies and the
    // view sees the new rows (PG query-time expansion semantics)
    e.sql("INSERT INTO reg_v1 VALUES (7, 'NEWLAND')")
    assert(e.sql("SELECT * FROM v_cnt").head.getLong(0) == 4)
    // duplicate CREATE VIEW rejected; OR REPLACE allowed
    intercept[IllegalArgumentException](
      e.sql("CREATE VIEW v_top AS SELECT 1"))
    e.sql("CREATE OR REPLACE VIEW v_top AS SELECT r_regionkey FROM reg_v1")
    assert(e.sql("SELECT count(*) AS n FROM v_top").head.getLong(0) == 6)
    e.sql("DROP VIEW v_top")
    intercept[IllegalArgumentException](e.sql("DROP VIEW v_top"))
    e.sql("DROP VIEW IF EXISTS v_top") // no-op, no throw
  }

  test("materialized view: precomputed, stale until REFRESH, drops as table") {
    val e = engine("mv")
    e.sql("CREATE MATERIALIZED VIEW mv_sum AS " +
      "SELECT count(*) AS n FROM reg_mv")
    assert(e.sql("SELECT n FROM mv_sum").head.getLong(0) == 5)
    e.sql("INSERT INTO reg_mv VALUES (8, 'LEMURIA')")
    // matview is a precomputed lake table: stays stale
    assert(e.sql("SELECT n FROM mv_sum").head.getLong(0) == 5)
    e.sql("REFRESH MATERIALIZED VIEW mv_sum")
    assert(e.sql("SELECT n FROM mv_sum").head.getLong(0) == 6)
    e.sql("DROP MATERIALIZED VIEW mv_sum")
    intercept[IllegalArgumentException](
      e.sql("REFRESH MATERIALIZED VIEW mv_sum"))
  }

  test("SET TIME ZONE drives timestamptz rendering (test_timezone.py)") {
    val e = LakeEngine(spark)
    try {
      e.sql("SET TIME ZONE 'Europe/Berlin'")
      assert(e.sql("SHOW timezone").head.getString(0) == "Europe/Berlin")
      // '+04' instant rendered in Berlin local time (CEST in May: +02)
      val berlin = e.sql(
        "SELECT ('2025-05-05 14:00:00+04'::timestamptz)::text AS t")
        .head.getString(0)
      assert(berlin == "2025-05-05 12:00:00", berlin)
      e.sql("SET timezone = 'UTC'")
      val utc = e.sql(
        "SELECT ('2025-05-05 14:00:00+04'::timestamptz)::text AS t")
        .head.getString(0)
      assert(utc == "2025-05-05 10:00:00", utc)
    } finally e.sql("RESET timezone")
  }

  test("SET/SHOW/RESET: custom GUCs allowed when dotted, else rejected") {
    val e = LakeEngine(spark)
    e.sql("SET pg_lake_table.enable_full_query_pushdown TO true")
    assert(e.sql("SHOW pg_lake_table.enable_full_query_pushdown")
      .head.getString(0) == "true")
    e.sql("SET search_path TO test, public")
    intercept[IllegalArgumentException](e.sql("SET nonsense TO 1"))
    intercept[IllegalArgumentException](e.sql("SHOW nonsense"))
    e.sql("RESET pg_lake_table.enable_full_query_pushdown")
    intercept[IllegalArgumentException](
      e.sql("SHOW pg_lake_table.enable_full_query_pushdown"))
  }

  test("EXPLAIN never executes; ANALYZE does (test_explain.py)") {
    val e = engine("ex")
    val plan = e.sql("EXPLAIN SELECT count(*) FROM reg_ex")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"), plan)
    // EXPLAIN DELETE shows the read side and does NOT delete
    e.sql("EXPLAIN DELETE FROM reg_ex WHERE r_regionkey = 0")
    assert(e.sql("SELECT count(*) FROM reg_ex").head.getLong(0) == 5)
    // EXPLAIN ANALYZE DML executes and reports the affected count
    val analyzed = e.sql("EXPLAIN ANALYZE DELETE FROM reg_ex " +
      "WHERE r_regionkey = 0").collect().map(_.getString(0))
    assert(analyzed.exists(_.contains("Rows affected: 1")), analyzed.toSeq)
    assert(e.sql("SELECT count(*) FROM reg_ex").head.getLong(0) == 4)
    // options list + VERBOSE formatted mode + EXECUTE binding
    e.sql("PREPARE exq(int) AS SELECT r_name FROM reg_ex WHERE r_regionkey = $1")
    val prepPlan = e.sql("EXPLAIN (VERBOSE, format 'json') EXECUTE exq(2)")
      .collect().map(_.getString(0)).mkString("\n")
    assert(prepPlan.contains("PushedFilters") || prepPlan.contains("Filter"),
      prepPlan)
    val rowsLine = e.sql("EXPLAIN ANALYZE SELECT * FROM reg_ex")
      .collect().map(_.getString(0))
    assert(rowsLine.exists(_.contains("Rows returned: 4")), rowsLine.toSeq)
  }
}
