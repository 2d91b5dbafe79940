package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable row-id lineage for lake tables (reference: table option
  * `row_ids = 'true'`, pg_lake_table/src/fdw/row_ids.c +
  * catalog/row_id_mappings.c; Iceberg v3 row-lineage shape).
  *
  * Model: a per-table sequence (`row_ids.next` metadata property,
  * advanced inside the commit CAS, so a reservation is atomic with the
  * files that consume it — the reference locks a PG sequence for the
  * same reason, row_ids.c:203-240). Each data file carries
  * [[RowIdRange]]s mapping position runs onto id runs:
  *
  *  - a freshly appended file gets ONE affine range
  *    `(next, rows, 0)` — ids are first_row_id + position, nothing is
  *    materialized in the file (reference CreateRowIdRangeForNewFile);
  *  - a rewritten file (copy-on-write delete survivors, compaction)
  *    materializes `_row_id` as a physical column and its ranges are
  *    re-derived from the written file as maximal consecutive-id runs
  *    (reference AddRowIdMaterializationToReadQuery +
  *    GetRowIdRangesFromFile, row_ids.c:362-520);
  *  - updated rows are NEW rows: they land in fresh files with fresh
  *    ids, like the reference's position-delete + append.
  *
  * Reads never need the materialized column: `(file, row_index)` joined
  * against the broadcast range table reconstructs `_row_id` uniformly
  * for both file classes. Scale: the range table is O(files +
  * delete-holes) — metadata-sized, always broadcastable; the join is a
  * BroadcastHashJoin on the file key with the range containment as the
  * residual.
  */
object RowIds {

  /** Name of the physical/derived row-id column (reference
    * INTERNAL_ROW_ID_COLUMN, also the Iceberg v3 reserved name).
    */
  val Col = "_row_id"

  /** Assign one affine range to every range-less non-empty entry, in
    * list order, starting at `props`' sequence value; returns the
    * updated entries plus properties with the sequence advanced. Runs
    * INSIDE the commit CAS (idempotent per attempt — it re-reads the
    * freshest sequence each time). Entries that already carry ranges
    * (rewrites that preserved lineage) pass through untouched.
    */
  def assignFresh(entries: Seq[FileEntry], props: Map[String, String])
      : (Seq[FileEntry], Map[String, String]) = {
    var next = props.get("row_ids.next").map(_.toLong).getOrElse(1L)
    val out = entries.map { e =>
      if (e.ranges.nonEmpty || e.rows == 0 || !e.isData) e
      else {
        val r = RowIdRange(next, e.rows, 0L)
        next += e.rows
        e.copy(rowIdRanges = Seq(r))
      }
    }
    (out, props.updated("row_ids.next", next.toString))
  }

  /** Normalize a path for joining driver-side entry paths against
    * Spark's `_metadata.file_path` (which is fully qualified:
    * `file:///tmp/x` vs a driver-side `/tmp/x`): drop any scheme and
    * leading slashes on both sides.
    */
  def normalizePath(p: Column): Column =
    regexp_replace(p, "^([a-zA-Z0-9.+-]+:)?/+", "")

  def normalizePathStr(p: String): String =
    p.replaceFirst("^([a-zA-Z0-9.+-]+:)?/+", "")

  /** The broadcastable range table of `files`:
    * (norm_path, row_id_start, num_rows, row_number_start).
    */
  def rangeTable(spark: SparkSession, files: Seq[FileEntry]): DataFrame = {
    import spark.implicits._
    files.flatMap(f => f.ranges.map(r =>
      (normalizePathStr(f.path), r.rowIdStart, r.numRows, r.rowNumberStart)))
      .toDF("__rid_path", "__rid_start", "__rid_n", "__rid_pos")
  }

  /** Join `df` (which must carry helper columns `__rid_fp` =
    * `_metadata.file_path` and `__rid_ri` = `_metadata.row_index`)
    * against the range table, yielding the original columns plus
    * `_row_id`. Inner join: the mapping invariant guarantees every
    * position is covered.
    */
  def attachRowIds(spark: SparkSession, df: DataFrame,
      files: Seq[FileEntry]): DataFrame = {
    val ranges = rangeTable(spark, files)
    val keep = df.columns.filterNot(c => c == "__rid_fp" || c == "__rid_ri")
    df.join(broadcast(ranges),
        normalizePath(col("__rid_fp")) === col("__rid_path") &&
          col("__rid_ri") >= col("__rid_pos") &&
          col("__rid_ri") < col("__rid_pos") + col("__rid_n"))
      .select(keep.map(col).toSeq :+
        (col("__rid_start") + col("__rid_ri") - col("__rid_pos"))
          .cast("bigint").as(Col): _*)
  }

  /** Re-derive ranges from freshly written files carrying a
    * materialized `_row_id` column: maximal runs where both the id and
    * the position advance by one (the reference computes the same runs
    * with lag/lead over file_row_number, GetRowIdRangesFromFile).
    * Returns ranges keyed by FILE NAME (unique within one write's
    * output). One window per file (parallel across files) + one small
    * agg; only the new files are scanned.
    */
  def deriveRanges(spark: SparkSession, paths: Seq[String])
      : Map[String, Seq[RowIdRange]] = {
    if (paths.isEmpty) return Map.empty
    val w = Window.partitionBy("fp").orderBy("ri")
    val rows = spark.read.parquet(paths: _*)
      .select(col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"), col(Col).as("rid"))
      .withColumn("brk",
        when(col("rid") - lag("rid", 1).over(w) === 1 &&
          col("ri") - lag("ri", 1).over(w) === 1, 0L).otherwise(1L))
      .withColumn("run", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("fp", "run")
      .agg(min("rid").as("start"), count(lit(1)).as("n"),
        min("ri").as("pos"))
      .select("fp", "start", "n", "pos")
      .collect()
    rows.groupBy(r => fileName(r.getString(0)))
      .map { case (name, rs) =>
        name -> rs.sortBy(_.getLong(3))
          .map(r => RowIdRange(r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSeq
      }
  }

  /** Attach derived ranges to the matching entries (matched by file
    * name — unique within one write's output directory).
    */
  def attachDerived(entries: Seq[FileEntry],
      derived: Map[String, Seq[RowIdRange]]): Seq[FileEntry] =
    entries.map { e =>
      derived.get(fileName(e.path)) match {
        case Some(rs) => e.copy(rowIdRanges = rs)
        case None => e // zero-row file: no ranges
      }
    }

  private def fileName(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)
}
