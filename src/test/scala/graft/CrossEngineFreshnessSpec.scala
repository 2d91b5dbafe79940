package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-process READ COMMITTED freshness through the engine's SQL
  * surface: a registered view pins the file list it was planned
  * against, so another engine's commit must trigger a re-register on
  * the next statement that references the table — PG's foreign scans
  * re-read Iceberg metadata per statement, so session A sees session
  * B's committed rows on A's very next query.
  */
class CrossEngineFreshnessSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("fresh").toString

  test("another engine's commit is visible to the next sql() statement") {
    val loc = s"${tmp()}/t"
    val e1 = LakeEngine(spark)
    e1.createTableAsSelect("fr_t", loc, Seq(1L).toDF("id"))
    val e2 = LakeEngine(spark)
    e2.loadTable("fr_t2", loc)
    e2.sql("INSERT INTO fr_t2 VALUES (2)")
    assert(e1.sql("SELECT count(*) FROM fr_t").first().getLong(0) == 2,
      "sql() view served a stale snapshot after a cross-engine commit")
    // both directions, repeatedly — the version-pointer check must
    // re-register on every external move, not just the first
    e2.sql("INSERT INTO fr_t2 VALUES (3)")
    assert(e1.sql("SELECT count(*) FROM fr_t").first().getLong(0) == 3)
    e1.sql("INSERT INTO fr_t VALUES (4)")
    assert(e2.sql("SELECT count(*) FROM fr_t2").first().getLong(0) == 4)
  }

  test("freshness respects isolation: REPEATABLE READ sql reads stay " +
      "pinned; staged in-tx state stays visible") {
    val loc = s"${tmp()}/t"
    val e1 = LakeEngine(spark)
    e1.createTableAsSelect("frr_t", loc, Seq(1L).toDF("id"))
    val e2 = LakeEngine(spark)
    e2.loadTable("frr_t2", loc)
    e1.sql("BEGIN ISOLATION LEVEL REPEATABLE READ")
    assert(e1.sql("SELECT count(*) FROM frr_t").first().getLong(0) == 1)
    e2.sql("INSERT INTO frr_t2 VALUES (2)")
    // the pointer moved, the view re-registers — from the PIN
    assert(e1.sql("SELECT count(*) FROM frr_t").first().getLong(0) == 1,
      "REPEATABLE READ sql read escaped its pin")
    e1.sql("COMMIT")
    assert(e1.sql("SELECT count(*) FROM frr_t").first().getLong(0) == 2)
    // in-tx: staged writes stay visible through the freshness check —
    // a WRITTEN table's view is the staged whole-table state (the
    // documented staging model; a concurrent external commit makes
    // this tx's COMMIT serialization-fail rather than merging, so the
    // staged view never has to splice external rows in)
    e1.sql("BEGIN")
    e1.sql("INSERT INTO frr_t VALUES (10)")
    e1.sql("INSERT INTO frr_t VALUES (11)")
    assert(e1.sql("SELECT count(*) FROM frr_t").first().getLong(0) == 4)
    e2.sql("INSERT INTO frr_t2 VALUES (3)")
    assert(e1.sql("SELECT count(*) FROM frr_t").first().getLong(0) == 4,
      "freshness check clobbered the staged in-tx view")
    e1.sql("ROLLBACK")
    // the external row is visible once the staged state is gone
    assert(e1.sql("SELECT count(*) FROM frr_t").first().getLong(0) == 3)
  }
}
