package graft

import graft.lake.LakeTable
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The `max_snapshot_age` retention surface (reference
  * test_max_snapshot_age_option.py; option.c:770, init.c:254,
  * table_metadata.c RemoveOldSnapshotsFromMetadata): per-table option
  * in seconds overriding the `pg_lake_iceberg.max_snapshot_age` GUC
  * (default 1800); an effective age of 0 expires old snapshots ON THE
  * WRITE PATH, non-zero ages apply at VACUUM; at least one snapshot is
  * always retained.
  */
class MaxSnapshotAgeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLoc(): String =
    Files.createTempDirectory("maxage").toString + "/t"

  test("setting max_snapshot_age 0 expires old snapshots on write") {
    val t = LakeTable.createAsSelect(spark, freshLoc(), "expire_on_write",
      Seq(1).toDF("id"),
      properties = Map("autovacuum_enabled" -> "false"))
    t.append(Seq(2).toDF("id"))
    t.append(Seq(3).toDF("id"))
    // createAsSelect = create + initial append, so 4 snapshots here
    assert(t.meta.snapshots.size == 4)
    t.setProperties(Map("max_snapshot_age" -> "0"))
    // the set-properties commit itself isn't a data-file change; the
    // next write expires everything but its own snapshot
    t.append(Seq(4).toDF("id"))
    assert(t.meta.snapshots.size == 1)
    assert(t.read().orderBy("id").as[Int].collect().toSeq == Seq(1, 2, 3, 4))
  }

  test("consecutive writes with max_snapshot_age=0 keep one snapshot each") {
    val t = LakeTable.createAsSelect(spark, freshLoc(), "consecutive",
      Seq(-1).toDF("id"),
      properties = Map("autovacuum_enabled" -> "false",
        "max_snapshot_age" -> "0"))
    (0 until 5).foreach { i =>
      t.append(Seq(i).toDF("id"))
      assert(t.meta.snapshots.size == 1, s"after write $i")
    }
    assert(t.read().count() == 6)
  }

  test("VACUUM applies the table-level max_snapshot_age") {
    val t = LakeTable.createAsSelect(spark, freshLoc(), "vacuum_option",
      Seq(1).toDF("id"),
      properties = Map("autovacuum_enabled" -> "false"))
    t.append(Seq(2).toDF("id"))
    t.append(Seq(3).toDF("id"))
    assert(t.meta.snapshots.size == 4)
    t.setProperties(Map("max_snapshot_age" -> "0"))
    t.vacuum()
    assert(t.meta.snapshots.size == 1)
    assert(t.read().count() == 3)
  }

  test("table-level option overrides the GUC") {
    val e = LakeEngine(spark)
    e.sql("SET pg_lake_iceberg.max_snapshot_age TO 0")
    try {
      val t = LakeTable.createAsSelect(spark, freshLoc(), "override_guc",
        Seq(1).toDF("id"),
        properties = Map("autovacuum_enabled" -> "false",
          "max_snapshot_age" -> "1000000"))
      t.append(Seq(2).toDF("id"))
      t.append(Seq(3).toDF("id"))
      // GUC says expire-everything-on-write; the table option wins
      assert(t.meta.snapshots.size == 4)

      // and without a table option, the GUC drives expire-on-write
      val g = LakeTable.createAsSelect(spark, freshLoc(), "guc_driven",
        Seq(1).toDF("id"),
        properties = Map("autovacuum_enabled" -> "false"))
      g.append(Seq(2).toDF("id"))
      assert(g.meta.snapshots.size == 1)
      assert(g.read().count() == 2)
    } finally e.sql("RESET pg_lake_iceberg.max_snapshot_age")
    // after RESET the default (1800 s) applies: no expire-on-write
    val h = LakeTable.createAsSelect(spark, freshLoc(), "post_reset",
      Seq(1).toDF("id"),
      properties = Map("autovacuum_enabled" -> "false"))
    h.append(Seq(2).toDF("id"))
    assert(h.meta.snapshots.size == 3)
  }

  test("validation: negative option and garbage GUC refuse loudly") {
    val t = LakeTable.createAsSelect(spark, freshLoc(), "invalid",
      Seq(1).toDF("id"))
    val neg = intercept[IllegalArgumentException] {
      t.setProperties(Map("max_snapshot_age" -> "-5"))
    }
    assert(neg.getMessage.contains(
      "option \"max_snapshot_age\" must be non-negative"))
    val e = LakeEngine(spark)
    val bad = intercept[IllegalArgumentException] {
      e.sql("SET pg_lake_iceberg.max_snapshot_age TO 'soon'")
    }
    assert(bad.getMessage.contains("max_snapshot_age"))
  }
}
