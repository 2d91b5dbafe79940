package graft.lake

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Per-column min/max/null statistics for one data file, stored as
  * strings and re-typed through the table schema when pruning (the
  * reference keeps the same per-file stats in a PG catalog —
  * pg_lake_engine/src/data_file/data_file_stats.c, consumed by
  * data_file_pruning.c).
  */
final case class ColStats(min: Option[String], max: Option[String],
    nullCount: Long)

/** One data file in a snapshot. `fieldStats` is keyed by field id (as a
  * string — JSON maps want string keys); `partStats` by transform
  * valueName, holding the min/max of the transform value over the file
  * (equal min/max = file belongs to exactly one partition).
  */
final case class FileEntry(
    path: String,
    rows: Long,
    bytes: Long,
    schemaVersion: Int,
    fieldStats: Map[String, ColStats],
    partStats: Map[String, ColStats])

/** A snapshot = complete file list after one commit (append / delete /
  * update / compact / truncate). Every write creates one
  * (docs/iceberg-tables.md:836-863); old snapshots serve time travel
  * until expired by vacuum.
  *
  * Scale note: the file list is embedded, which is fine to O(100k)
  * files per table; past that the list would move to Iceberg-style
  * manifest files referenced here. The commit protocol is unchanged
  * either way.
  */
final case class Snapshot(
    id: Long,
    timestampMs: Long,
    operation: String,
    files: Seq[FileEntry])

/** One versioned column. Columns are tracked by integer field id, never
  * by name, so renames are metadata-only (reference:
  * pg_lake_table/src/fdw/schema_operations/register_field_ids.c).
  * `physicalName` is the column name as written inside data files of a
  * given schema version.
  */
final case class FieldDef(id: Int, name: String, dataType: String,
    nullable: Boolean = true)

final case class SchemaVersion(version: Int, fields: Seq[FieldDef])

final case class TableMetadata(
    name: String,
    formatVersion: Int,
    schemas: Seq[SchemaVersion],
    currentSchemaVersion: Int,
    partitionSpec: Seq[String], // transform strings, e.g. "day(ts)"
    snapshots: Seq[Snapshot],
    currentSnapshotId: Long,
    nextFieldId: Int,
    properties: Map[String, String] = Map.empty) {

  def currentSchema: SchemaVersion =
    schemas.find(_.version == currentSchemaVersion).get

  def schemaAt(v: Int): SchemaVersion = schemas.find(_.version == v).get

  def currentSnapshot: Option[Snapshot] =
    snapshots.find(_.id == currentSnapshotId)

  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.id == id)

  def transforms: Seq[PartitionTransform] =
    partitionSpec.map(PartitionTransform.parse)

  /** Spark StructType of the current schema (current names). */
  def sparkSchema: StructType = TableMetadata.toStruct(currentSchema)
}

object TableMetadata {
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def toStruct(sv: SchemaVersion): StructType = {
    import org.apache.spark.sql.types._
    StructType(sv.fields.map(f =>
      StructField(f.name, DataType.fromDDL(f.dataType), f.nullable)))
  }

  /** On-disk schema: intervals persist as the 3-field struct
    * (IntervalStorage, SURVEY §1.2); everything else is 1:1.
    */
  def physicalStruct(sv: SchemaVersion): StructType = {
    import org.apache.spark.sql.types._
    StructType(sv.fields.map { f =>
      val dt = DataType.fromDDL(f.dataType)
      val physical =
        if (IntervalStorage.isInterval(dt)) IntervalStorage.physicalType else dt
      StructField(f.name, physical, f.nullable)
    })
  }

  def fromStruct(name: String, schema: StructType,
      spec: Seq[String]): TableMetadata = {
    // multidimensional arrays are not representable in the storage
    // format (docs/iceberg-tables.md:116,139-141 — the reference
    // rejects them at DDL time too)
    schema.fields.foreach { f =>
      f.dataType match {
        case org.apache.spark.sql.types.ArrayType(
            _: org.apache.spark.sql.types.ArrayType, _) =>
          throw new IllegalArgumentException(
            s"column ${f.name}: multidimensional arrays are not supported")
        case _ =>
      }
    }
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      FieldDef(i + 1, f.name, f.dataType.sql, f.nullable)
    }.toSeq
    TableMetadata(name, 1, Seq(SchemaVersion(1, fields)), 1, spec,
      Seq(Snapshot(0, System.currentTimeMillis(), "create", Nil)), 0,
      fields.size + 1)
  }

  def serialize(m: TableMetadata): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(m)

  def deserialize(json: String): TableMetadata =
    mapper.readValue(json, classOf[TableMetadata])

  // ---- commit protocol --------------------------------------------------
  //
  // Like the reference's metadata.json + catalog-row CAS
  // (pg_lake_iceberg/src/iceberg/catalog.c:304-398): a commit is an
  // atomic put-if-absent of the immutable _meta/v{N}.json where N =
  // base-version-read + 1. The successor is fully written to a temp
  // file first and published via hard-link (POSIX link(2) fails if the
  // target exists and is atomic — rename would silently replace), so
  // the commit point is the link creation and readers can never observe
  // a partial file. Losing the CAS ⇒ a concurrent writer committed on
  // the SAME base; the caller reloads, reapplies, retries. On object
  // storage this maps to put-if-absent / a catalog-service CAS.

  def metaDir(location: String): Path = Paths.get(location, "_meta")

  /** Latest committed version = max vN.json present (the link is the
    * commit point; no separate pointer file to race on).
    */
  def currentVersion(location: String): Option[Int] = {
    val dir = metaDir(location)
    if (!Files.exists(dir)) return None
    val vPat = "v(\\d+)\\.json".r
    val s = Files.list(dir)
    try {
      val vs = s.iterator().asScala.flatMap(p =>
        p.getFileName.toString match {
          case vPat(n) => Some(n.toInt)
          case _ => None
        }).toSeq
      if (vs.isEmpty) None else Some(vs.max)
    } finally s.close()
  }

  def load(location: String): TableMetadata =
    loadVersion(location, currentVersion(location).getOrElse(
      throw new IllegalStateException(s"no lake table at $location")))

  private def loadVersion(location: String, v: Int): TableMetadata =
    deserialize(new String(Files.readAllBytes(
      metaDir(location).resolve(s"v$v.json"))))

  /** Publish `next` as exactly version `v` (base + 1). False when a
    * concurrent writer already owns `v` — caller must reload and retry.
    */
  def tryCommit(location: String, next: TableMetadata, v: Int): Boolean = {
    val dir = metaDir(location)
    Files.createDirectories(dir)
    val target = dir.resolve(s"v$v.json")
    if (Files.exists(target)) return false
    val tmp = Files.createTempFile(dir, s"v$v", ".tmp")
    try {
      Files.write(tmp, serialize(next).getBytes)
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  /** Commit with optimistic retry: `apply` maps the freshly-loaded
    * metadata to its successor; the CAS is pinned to the version that
    * was loaded, so a stale writer can never overwrite an intervening
    * commit.
    */
  def commit(location: String, create: Boolean = false)(
      apply: Option[TableMetadata] => TableMetadata): TableMetadata = {
    var attempts = 0
    while (attempts < 50) {
      val baseV = currentVersion(location)
      val cur = baseV.map(v => loadVersion(location, v))
      val next = apply(cur)
      if (tryCommit(location, next, baseV.getOrElse(0) + 1)) return next
      attempts += 1
      Thread.sleep(math.min(200L, 5L << math.min(attempts, 5)))
    }
    throw new IllegalStateException(
      s"commit contention: gave up after $attempts attempts at $location")
  }
}
