package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Spark-planner integration for managed lake tables: a [[FileIndex]]
  * whose `listFiles` applies our stats + hidden-partition pruning to
  * the snapshot's file list using the QUERY'S OWN data filters.
  *
  * This is the idiomatic Spark shape of the reference's scan-snapshot
  * pruning (CreatePgLakeScanSnapshot → PruneDataFiles): Catalyst's
  * FileSourceStrategy hands every scan-eligible predicate to the index,
  * so `spark.sql("... WHERE ts >= X")` over a registered lake table
  * prunes data files automatically — no explicit `scan(filter)` call —
  * and the surviving predicates still reach the parquet reader for
  * row-group skipping. EXPLAIN shows the pruned file count on the
  * FileScan node, the analogue of the reference's
  * `Data Files Scanned/Skipped`.
  */
final class LakeFileIndex(spark: SparkSession, meta: TableMetadata)
    extends FileIndex {

  private val files: Seq[FileEntry] =
    meta.currentSnapshot.map(_.dataFiles).getOrElse(Nil)

  /** Observability: (kept, total) of the last listFiles call. */
  @volatile var lastPruning: (Int, Int) = (files.size, files.size)

  override def rootPaths: Seq[Path] =
    Seq(new Path("file://" + meta.name))

  override def partitionSchema: StructType = new StructType()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty) files
      else Pruning.keep(meta,
        dataFilters.reduce(org.apache.spark.sql.catalyst.expressions.And),
        files)
    lastPruning = (kept.size, files.size)
    val statuses = kept.map { fe =>
      new FileStatus(fe.bytes, false, 1, 128L << 20, 0L,
        new Path("file://" + fe.path))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }

  override def inputFiles: Array[String] = files.map(_.path).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = math.max(1L, files.map(_.bytes).sum)
}

object LakeFileIndex {

  /** A DataFrame over the table's current snapshot backed by the
    * pruning FileIndex. Only valid while every file carries the current
    * schema version (after metadata-only renames/adds, older files need
    * the per-version projection of LakeTable.readFiles instead — the
    * caller falls back).
    */
  def relation(spark: SparkSession, meta: TableMetadata): DataFrame =
    relationFor(spark, meta, new LakeFileIndex(spark, meta))

  /** Same, over a caller-held index (so the caller can read the
    * pruning counters after execution).
    */
  def relationFor(spark: SparkSession, meta: TableMetadata,
      index: LakeFileIndex): DataFrame = {
    val schema = meta.sparkSchema
    val rel = HadoopFsRelation(index, new StructType(), schema, None,
      new ParquetFileFormat, Map.empty)(
      org.apache.spark.sql.GraftBridge.classicSession(spark))
    org.apache.spark.sql.GraftBridge.ofRows(spark, LogicalRelation(rel))
  }

  def singleSchemaVersion(meta: TableMetadata): Boolean =
    meta.currentSnapshot.map(_.dataFiles).getOrElse(Nil)
      .forall(_.schemaVersion == meta.currentSchemaVersion)
}
