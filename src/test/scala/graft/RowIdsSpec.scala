package graft

import graft.lake._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stable row-id lineage (`row_ids = 'true'`), mirroring the
  * reference's test_row_ids.py invariants:
  *  - mapping completeness: sum of range sizes == sum of data-file
  *    rows (validate_row_id_mappings);
  *  - materialized `_row_id` in rewritten files matches the mappings
  *    value-for-value (validate_row_id_in_files);
  *  - ids are stable across copy-on-write delete, update (survivors)
  *    and compaction; updated rows get FRESH ids (position-delete +
  *    append semantics);
  *  - the delete-then-compact run-splitting arithmetic (5..6 ranges
  *    for two 20-row inserts minus x∈{2,4}, test_row_ids.py:167-199).
  */
class RowIdsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLoc() = LakeEngine.tempLocation("rowids")

  private def mk(n: Int, loc: String, rowIds: Boolean = true): LakeTable = {
    val df = spark.range(1, n + 1).coalesce(1)
      .selectExpr("id AS x", "id AS y")
    val t = LakeTable.create(spark, loc, "t", df.schema,
      properties = if (rowIds) Map("row_ids" -> "true") else Map.empty)
    t.append(df)
    t
  }

  /** validate_row_id_mappings: mapped rows == data-file rows, per file.
    * Position-delete files (content=1) carry no ranges by design: the
    * affine mapping of their TARGET files stays intact, deleted
    * positions simply never surface in reads.
    */
  private def validateMappings(t: LakeTable): Unit = {
    val files = t.meta.currentSnapshot.map(_.dataFiles).getOrElse(Nil)
    files.foreach { f =>
      assert(f.ranges.map(_.numRows).sum == f.rows,
        s"file ${f.path}: ranges cover ${f.ranges.map(_.numRows).sum} " +
          s"of ${f.rows} rows")
      // ranges are disjoint position runs inside the file
      val pos = f.ranges.sortBy(_.rowNumberStart)
      pos.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.rowNumberStart + a.numRows <= b.rowNumberStart)
        case _ => ()
      }
      pos.foreach(r => assert(r.rowNumberStart + r.numRows <= f.rows))
    }
    // ids globally unique and below the sequence
    val ids = t.readWithRowIds().select("_row_id").as[Long].collect()
    assert(ids.distinct.length == ids.length, "duplicate row ids")
    assert(ids.forall(i => i >= 1 && i < t.meta.nextRowId))
  }

  test("appends draw affine ranges from the sequence") {
    val t = mk(10, freshLoc())
    t.append(spark.range(1, 11).coalesce(1).selectExpr("id AS x", "id AS y"))
    validateMappings(t)
    val m = t.rowIdMappings.orderBy("row_id_start").collect()
    assert(m.map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 10L, 0L), (11L, 10L, 0L)))
    assert(t.meta.nextRowId == 21L)
    // _row_id is 1:1 with rows and matches insertion arithmetic:
    // both appends inserted x=1..10, so each x value carries two ids
    // exactly 10 apart
    val byX = t.readWithRowIds().groupBy("x")
      .agg(min("_row_id").as("lo"), max("_row_id").as("hi"))
      .select(($"hi" - $"lo").as[Long]).collect()
    assert(byX.forall(_ == 10L))
  }

  test("enable on existing table assigns per-file ranges; ddl guards") {
    val loc = freshLoc()
    val df1 = Seq((1L, 1L)).toDF("x", "y")
    val t = LakeTable.create(spark, loc, "t", df1.schema)
    t.append(df1)
    t.append(Seq((2L, 2L)).toDF("x", "y"))
    assert(t.rowIdMappings.count() == 0)
    t.enableRowIds()
    assert(t.rowIdMappings.count() == 2)
    // first_row_id set per file (reference checks min=1, max=2)
    val fri = t.files.select("first_row_id").as[Long].collect().sorted
    assert(fri.toSeq == Seq(1L, 2L))
    validateMappings(t)
    // re-enable: no-op (same metadata version)
    val v = TableMetadata.currentVersion(loc)
    t.setProperties(Map("row_ids" -> "true"))
    assert(TableMetadata.currentVersion(loc) == v)
    // disabling is refused like the reference
    val e = intercept[IllegalArgumentException] {
      t.setProperties(Map("row_ids" -> "false"))
    }
    assert(e.getMessage.contains("currently not supported"))
  }

  test("delete preserves survivor ids; truncate clears mappings") {
    val t = mk(20, freshLoc())
    val before = t.readWithRowIds().select("x", "_row_id")
      .as[(Long, Long)].collect().toMap
    t.delete(col("x") === 7L || col("x") === 13L)
    validateMappings(t)
    val after = t.readWithRowIds().select("x", "_row_id")
      .as[(Long, Long)].collect().toMap
    assert(after.size == 18)
    after.foreach { case (x, id) => assert(before(x) == id,
      s"x=$x changed id ${before(x)} -> $id") }
    t.truncate()
    assert(t.rowIdMappings.count() == 0)
  }

  test("update: survivors keep ids, updated rows get fresh ids") {
    val t = mk(10, freshLoc())
    val before = t.readWithRowIds().select("x", "_row_id")
      .as[(Long, Long)].collect().toMap
    val n = t.update(col("x") === 7L, Map("y" -> lit(15L)))
    assert(n == 1L)
    validateMappings(t)
    val after = t.readWithRowIds().select("x", "_row_id")
      .as[(Long, Long)].collect().toMap
    assert(after.size == 10)
    // untouched rows keep their ids
    (before.keySet - 7L).foreach(x => assert(after(x) == before(x)))
    // the updated row is a new row version: fresh id past the old range
    assert(after(7L) >= 11L)
    assert(t.read().filter($"x" === 7L).select("y").as[Long].head() == 15L)
  }

  test("compaction materializes _row_id and splits ranges at holes") {
    val t = mk(20, freshLoc())
    t.append(spark.range(1, 21).coalesce(1).selectExpr("id AS x", "id AS y"))
    t.delete(col("x") === 2L || col("x") === 4L)
    validateMappings(t)
    val before = t.readWithRowIds().select("_row_id").as[Long]
      .collect().sorted
    t.compact(smallBytes = 1L << 30, targetBytes = 1L << 30)
    assert(t.meta.snapshots.last.operation == "compact")
    validateMappings(t)
    // ids survive compaction bit-for-bit
    val after = t.readWithRowIds().select("_row_id").as[Long]
      .collect().sorted
    assert(after.toSeq == before.toSeq)
    // run-splitting arithmetic: ids 1..40 minus {2,4,22,24} sorted =
    // runs 1 | 3 | 5..21 | 23 | 25..40 (the reference observes 5..6
    // depending on read order; ours sorts by _row_id => exactly 5)
    assert(t.rowIdMappings.count() == 5)
    // validate_row_id_in_files: the materialized column matches the
    // mapping-derived value for every row
    val paths = t.meta.currentSnapshot.get.files.map(_.path)
    val raw = spark.read.parquet(paths: _*)
      .select(col("_row_id"), col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
    val mapped = t.rowIdMappings
      .withColumn("np", RowIds.normalizePath(col("path")))
    val matches = raw.join(mapped,
        RowIds.normalizePath(col("fp")) === col("np") &&
          col("ri") >= col("row_number_start") &&
          col("ri") < col("row_number_start") + col("num_rows") &&
          col("_row_id") ===
            col("row_id_start") + col("ri") - col("row_number_start"))
      .count()
    assert(matches == t.read().count())
  }

  test("partitioned row-ids table: ranges cover the fan-out write") {
    val df = spark.range(1, 101)
      .selectExpr("id AS x", "CAST(id % 4 AS BIGINT) AS grp")
    val t = LakeTable.create(spark, freshLoc(), "t", df.schema,
      partitionSpec = Seq("identity(grp)"),
      properties = Map("row_ids" -> "true"))
    t.append(df)
    validateMappings(t)
    assert(t.readWithRowIds().count() == 100)
    // partition pruning still works alongside row ids
    assert(t.scan(Some(col("grp") === 2L)).count() == 25)
  }

  test("SQL surface: ALTER TABLE ... SET (row_ids 'true')") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("rid_sql", LakeEngine.tempLocation("ridsql"),
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    e.sql("ALTER TABLE rid_sql SET (row_ids 'true')")
    val t = e.table("rid_sql")
    assert(t.meta.rowIdsEnabled)
    assert(t.rowIdMappings.count() >= 1)
    validateMappings(t)
    e.sql("INSERT INTO rid_sql VALUES (3, 'c')")
    validateMappings(t)
    assert(t.readWithRowIds().count() == 3)
  }

  test("zero-row appends allocate nothing") {
    val t = mk(5, freshLoc())
    val next = t.meta.nextRowId
    t.append(spark.range(0).selectExpr("id AS x", "id AS y"))
    assert(t.meta.nextRowId == next)
    validateMappings(t)
  }
}
