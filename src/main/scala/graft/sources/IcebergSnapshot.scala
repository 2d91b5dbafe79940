package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.io.File
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** External Apache Iceberg snapshot scan (SURVEY.md §2.1; reference
  * reads the same structures in C: read_table_metadata.c,
  * read_manifest.c, avro/avro_reader.c): point at a `*.metadata.json`,
  * walk manifest-list → manifests (Avro, via the avro-core library —
  * metadata is tiny and driver-side), resolve the live data-file list,
  * and scan it as ordinary Parquet. Snapshot selection gives time
  * travel over external tables.
  *
  * Scale note: metadata I/O is O(#manifests) on the driver — the same
  * place Spark's own DSv2 file listing happens; executors only ever
  * see the resolved parquet paths.
  */
object IcebergSnapshot {

  private val mapper = new ObjectMapper()

  private def localPath(uri: String): String =
    uri.stripPrefix("file://").stripPrefix("file:")

  def metadata(metadataPath: String): JsonNode =
    mapper.readTree(new File(localPath(metadataPath)))

  // ---- schema ----------------------------------------------------------

  /** Current (or `schemaId`) Iceberg schema as a Spark StructType. */
  def schemaOf(metadataPath: String): StructType = {
    val root = metadata(metadataPath)
    val schemaNode =
      if (root.has("schemas")) {
        val cur = root.get("current-schema-id").asInt(0)
        root.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt(-1) == cur)
          .getOrElse(root.get("schemas").get(0))
      } else root.get("schema") // format v1
    structOf(schemaNode)
  }

  private def structOf(node: JsonNode): StructType =
    StructType(node.get("fields").elements().asScala.map { f =>
      StructField(f.get("name").asText(), typeOf(f.get("type")),
        !f.get("required").asBoolean(false))
    }.toSeq)

  private def typeOf(t: JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "string" => StringType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "time" => LongType // micros-of-day convention (SURVEY §1.2)
      case "binary" => BinaryType
      case "uuid" => StringType
      case s if s.startsWith("decimal") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case s if s.startsWith("fixed") => BinaryType
      case other => throw new IllegalArgumentException(s"iceberg type $other")
    } else t.get("type").asText() match {
      case "struct" => structOf(t)
      case "list" => ArrayType(typeOf(t.get("element")),
        !t.get("element-required").asBoolean(false))
      case "map" => MapType(typeOf(t.get("key")), typeOf(t.get("value")),
        !t.get("value-required").asBoolean(false))
      case other => throw new IllegalArgumentException(s"iceberg type $other")
    }

  /** Top-level Iceberg fields with their ids (for stats keying). */
  def fieldDefs(metadataPath: String): Seq[graft.lake.FieldDef] =
    fieldDefsOfMetadata(metadata(metadataPath))

  /** [[fieldDefs]] over an already-parsed table-metadata node (e.g. a
    * LoadTableResult's inline `metadata` — no file round trip).
    */
  def fieldDefsOfMetadata(root: JsonNode): Seq[graft.lake.FieldDef] = {
    val schemaNode =
      if (root.has("schemas")) {
        val cur = root.get("current-schema-id").asInt(0)
        root.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt(-1) == cur)
          .getOrElse(root.get("schemas").get(0))
      } else root.get("schema")
    fieldDefsOf(schemaNode)
  }

  /** Parse an Iceberg schema JSON node (metadata.json or a REST
    * CreateTable request body) into field defs.
    */
  def fieldDefsOf(schemaNode: JsonNode): Seq[graft.lake.FieldDef] =
    schemaNode.get("fields").elements().asScala.map { f =>
      graft.lake.FieldDef(f.get("id").asInt(), f.get("name").asText(),
        typeOf(f.get("type")).sql, !f.get("required").asBoolean(false))
    }.toSeq

  // ---- snapshot / manifest walk ---------------------------------------

  final case class DataFileRef(path: String, format: String, records: Long,
      bytes: Long, stats: Map[String, graft.lake.ColStats] = Map.empty,
      seq: Long = 0L, manifestPath: String = "", specId: Int = 0)

  /** A v2 delete file: `content` 1 = position, 2 = equality. `seq` is the
    * data sequence number (entry-level when present, else inherited from
    * the manifest-list row per the spec's metadata inheritance).
    */
  final case class DeleteFileRef(path: String, content: Int,
      equalityIds: Seq[Int], seq: Long)

  private def opt(r: GenericRecord, name: String): Option[AnyRef] =
    if (r.getSchema.getField(name) != null) Option(r.get(name)) else None

  private def readAvro(path: String): Seq[GenericRecord] = {
    val reader = DataFileReader.openReader(new File(localPath(path)),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toList finally reader.close()
  }

  /** An int-keyed manifest map (array<record{key,value}> per the spec)
    * back to a Scala map; absent/null fields → empty.
    */
  private def kvMap(df: GenericRecord, name: String): Map[Int, AnyRef] =
    opt(df, name) match {
      case Some(arr: java.util.Collection[_]) =>
        arr.asScala.map { kv =>
          val r = kv.asInstanceOf[GenericRecord]
          r.get("key").toString.toInt -> r.get("value")
        }.toMap
      case _ => Map.empty
    }

  private def bytesOf(v: AnyRef): Array[Byte] = v match {
    case bb: java.nio.ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case a: Array[Byte] => a
  }

  /** Live data files of a snapshot (default: current), with per-file
    * column stats decoded from value/null counts and lower/upper bounds
    * when the manifest carries them (reference reads the same stats in
    * read_manifest.c) — keyed by field id, in the stat-string form
    * [[graft.lake.Pruning]] consumes.
    */
  private def snapshotNode(root: JsonNode, metadataPath: String,
      snapshotId: Option[Long]): JsonNode = {
    val wanted = snapshotId.getOrElse(root.get("current-snapshot-id").asLong())
    root.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == wanted)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $wanted not in $metadataPath"))
  }

  /** Entry-level data sequence number, inheriting the manifest-list row's
    * when absent/null (spec: sequence-number inheritance for ADDED rows).
    */
  private def entrySeq(entry: GenericRecord, listSeq: Long): Long =
    opt(entry, "sequence_number").map(_.toString.toLong).getOrElse(listSeq)

  def dataFiles(metadataPath: String,
      snapshotId: Option[Long] = None): Seq[DataFileRef] = {
    val root = metadata(metadataPath)
    val snap = snapshotNode(root, metadataPath, snapshotId)
    val typesById: Map[Int, DataType] = fieldDefs(metadataPath)
      .map(f => f.id -> DataType.fromDDL(f.dataType)).toMap

    val manifests: Seq[(String, Long, Int)] =
      if (snap.has("manifest-list"))
        dataManifestsOf(snap.get("manifest-list").asText())
      else // v1 inline manifest array
        snap.get("manifests").elements().asScala
          .map(m => (m.asText(), 0L, 0)).toSeq

    walkManifests(manifests, typesById)
  }

  /** Data manifests of a manifest-list file: (path, seq, spec-id). */
  private def dataManifestsOf(listPath: String): Seq[(String, Long, Int)] =
    readAvro(listPath)
      .filter(m => opt(m, "content").forall(_.toString == "0")) // data
      .map(m => (m.get("manifest_path").toString,
        opt(m, "sequence_number").map(_.toString.toLong).getOrElse(0L),
        opt(m, "partition_spec_id").map(_.toString.toInt).getOrElse(0)))

  /** Walk a manifest-list an external engine wrote (the REST-commit
    * import path: the client hands the catalog an add-snapshot whose
    * manifest-list it already staged; the catalog only reads metadata).
    * `typesById` decodes the per-file bound bytes.
    */
  def dataFilesFromManifestList(listPath: String,
      typesById: Map[Int, DataType]): Seq[DataFileRef] =
    walkManifests(dataManifestsOf(listPath), typesById)

  private def walkManifests(manifests: Seq[(String, Long, Int)],
      typesById: Map[Int, DataType]): Seq[DataFileRef] = {
    manifests.flatMap { case (mPath, listSeq, specId) =>
      readAvro(mPath).flatMap { entry =>
        val status = opt(entry, "status").map(_.toString.toInt).getOrElse(1)
        if (status == 2) None // DELETED
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = opt(df, "content").map(_.toString.toInt).getOrElse(0)
          if (content != 0) None // delete files live in delete manifests
          else {
            val nulls = kvMap(df, "null_value_counts")
              .map { case (k, v) => k -> v.toString.toLong }
            val lower = kvMap(df, "lower_bounds")
            val upper = kvMap(df, "upper_bounds")
            def bound(m: Map[Int, AnyRef], id: Int): Option[String] =
              m.get(id).flatMap(v => typesById.get(id).flatMap(dt =>
                graft.lake.IcebergValues.fromBytes(bytesOf(v), dt)))
            val ids = nulls.keySet ++ lower.keySet ++ upper.keySet
            val stats = ids.map { id =>
              // -1 null count = "unknown": Pruning then never takes a
              // null-count-dependent decision (no false Skip on IS NULL)
              id.toString -> graft.lake.ColStats(
                bound(lower, id), bound(upper, id),
                nulls.getOrElse(id, -1L))
            }.toMap
            Some(DataFileRef(
              df.get("file_path").toString,
              df.get("file_format").toString.toUpperCase,
              df.get("record_count").toString.toLong,
              opt(df, "file_size_in_bytes").map(_.toString.toLong).getOrElse(0L),
              stats,
              entrySeq(entry, listSeq),
              mPath, specId))
          }
        }
      }
    }
  }

  /** Delete files of a snapshot (v2 merge-on-read, spec: delete
    * manifests have manifest-list `content = 1`; their entries'
    * `data_file.content` is 1 for position deletes, 2 for equality
    * deletes — the reference reads both in read_manifest.c:1-674).
    * Equality deletes carry the spec's `equality_ids` field-id list and
    * the data sequence number that scopes which data files they apply to.
    */
  def deleteFiles(metadataPath: String,
      snapshotId: Option[Long] = None): Seq[DeleteFileRef] = {
    val root = metadata(metadataPath)
    val snap = snapshotNode(root, metadataPath, snapshotId)
    if (!snap.has("manifest-list")) return Nil // v1: no delete manifests
    readAvro(snap.get("manifest-list").asText())
      .filter(m => opt(m, "content").exists(_.toString == "1"))
      .flatMap { m =>
        val mPath = m.get("manifest_path").toString
        val listSeq = opt(m, "sequence_number").map(_.toString.toLong)
          .getOrElse(0L)
        readAvro(mPath).flatMap { entry =>
          val status = opt(entry, "status").map(_.toString.toInt).getOrElse(1)
          if (status == 2) None
          else {
            val df = entry.get("data_file").asInstanceOf[GenericRecord]
            val seq = entrySeq(entry, listSeq)
            opt(df, "content").map(_.toString.toInt).getOrElse(0) match {
              case 1 => Some(DeleteFileRef(
                df.get("file_path").toString, 1, Nil, seq))
              case 2 =>
                val ids = opt(df, "equality_ids") match {
                  case Some(c: java.util.Collection[_]) =>
                    c.asScala.map(_.toString.toInt).toSeq
                  case _ => Nil
                }
                if (ids.isEmpty) throw new IllegalStateException(
                  s"equality delete without equality_ids in $mPath")
                Some(DeleteFileRef(
                  df.get("file_path").toString, 2, ids, seq))
              case other => throw new IllegalStateException(
                s"unexpected content=$other in delete manifest $mPath")
            }
          }
        }
      }
  }

  /** `lake_iceberg.files(url)` equivalent — the reference's documented
    * column set (docs/iceberg-tables.md:639-656): manifest provenance,
    * content (0 = data; delete files live in [[deleteFiles]]), spec id,
    * and per-file counts.
    */
  def files(spark: SparkSession, metadataPath: String): DataFrame = {
    import spark.implicits._
    dataFiles(metadataPath)
      .map(f => (f.manifestPath, 0, f.path, f.format, f.specId,
        f.records, f.bytes))
      .toDF("manifest_path", "content", "file_path", "file_format",
        "spec_id", "record_count", "file_size_in_bytes")
  }

  /** Interop probes over standalone manifest files (the reference's
    * test_common/sample/iceberg fixtures — real files other writers
    * produced): the manifest paths of a manifest list, and one
    * manifest's data-file paths.
    */
  def manifestsOf(listPath: String): Seq[String] =
    dataManifestsOf(listPath).map(_._1)

  def manifestFilePaths(manifestPath: String): Seq[String] =
    readAvro(manifestPath).flatMap(e =>
      Option(e.get("data_file")).map(
        _.asInstanceOf[GenericRecord].get("file_path").toString))

  /** `lake_iceberg.find_all_referenced_files(metadata_location)`
    * (reference test_iceberg_referenced_files.py; the VACUUM GC's live
    * set): every file the metadata still references, in the
    * reference's order — the metadata.json itself, then manifest
    * lists, then manifests (data AND delete), then data/delete files —
    * across ALL retained snapshots, deduplicated. Entries with status
    * DELETED are no longer referenced and are excluded.
    */
  def referencedFiles(metadataPath: String): Seq[String] = {
    val root = metadata(metadataPath)
    val lists = root.get("snapshots").elements().asScala.toSeq
      .flatMap { s =>
        if (s.has("manifest-list")) Seq(s.get("manifest-list").asText())
        else Seq.empty // v1 inline manifests handled below
      }.distinct
    val v1Manifests = root.get("snapshots").elements().asScala.toSeq
      .flatMap { s =>
        if (s.has("manifests"))
          s.get("manifests").elements().asScala.map(_.asText()).toSeq
        else Seq.empty
      }
    val manifests = (lists.flatMap(lp =>
      readAvro(lp).map(_.get("manifest_path").toString)) ++ v1Manifests)
      .distinct
    val leaves = manifests.flatMap { mp =>
      readAvro(mp).flatMap { entry =>
        val status = opt(entry, "status").map(_.toString.toInt).getOrElse(1)
        if (status == 2) None
        else Some(entry.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString)
      }
    }.distinct
    Seq(metadataPath) ++ lists ++ manifests ++ leaves
  }

  /** `lake_iceberg.data_file_stats(metadata_location)` (reference
    * pg_lake_read_data_file_stats): per data file of the current
    * snapshot, the sequence number and the DECODED lower/upper bounds
    * as JSON objects keyed by field id.
    */
  def dataFileStats(spark: SparkSession, metadataPath: String)
      : DataFrame = {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def boundsJson(stats: Map[String, graft.lake.ColStats],
        pick: graft.lake.ColStats => Option[String]): String = {
      val node = mapper.createObjectNode()
      stats.toSeq.sortBy(_._1.toInt).foreach { case (id, cs) =>
        pick(cs).foreach(v => node.put(id, v))
      }
      mapper.writeValueAsString(node)
    }
    dataFiles(metadataPath)
      .map(f => (f.path, f.seq,
        boundsJson(f.stats, _.min), boundsJson(f.stats, _.max)))
      .toDF("path", "sequence_number", "lower_bounds", "upper_bounds")
  }

  /** `lake_iceberg.metadata(url)` equivalent: the raw table-metadata
    * JSON (Iceberg spec §table-metadata) as one row — compose with the
    * JSON functions the way the reference composes it with jsonb ops
    * (docs/iceberg-tables.md:601-612).
    */
  def metadataJson(spark: SparkSession, metadataPath: String): DataFrame = {
    import spark.implicits._
    val txt = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(localPath(metadataPath))),
      java.nio.charset.StandardCharsets.UTF_8)
    Seq(txt).toDF("metadata")
  }

  /** Scan an external Iceberg snapshot as a DataFrame. When the
    * manifests carry bounds/null counts, the scan goes through the same
    * stats-pruning FileIndex managed tables use
    * ([[graft.lake.LakeFileIndex]]) — query predicates skip data files
    * from exported bounds exactly as the reference prunes external
    * Iceberg scans (data_file_pruning.c over read_manifest.c stats).
    */
  def read(spark: SparkSession, metadataPath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val schema = schemaOf(metadataPath)
    val fs = dataFiles(metadataPath, snapshotId)
    require(fs.forall(_.format == "PARQUET"),
      s"non-parquet data files: ${fs.filter(_.format != "PARQUET").map(_.path)}")
    if (fs.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

    val base =
      if (fs.forall(_.stats.isEmpty))
        spark.read.schema(schema).parquet(fs.map(f => localPath(f.path)): _*)
      else {
        import graft.lake.{FileEntry, LakeFileIndex, SchemaVersion, Snapshot, TableMetadata}
        val defs = fieldDefs(metadataPath)
        val entries = fs.map(f => FileEntry(localPath(f.path), f.records,
          f.bytes, 1, f.stats, Map.empty))
        val synthetic = TableMetadata(metadataPath, 2,
          Seq(SchemaVersion(1, defs)), 1, Nil,
          Seq(Snapshot(0L, 0L, "import", entries)), 0L,
          defs.map(_.id).max + 1)
        LakeFileIndex.relation(spark, synthetic)
      }

    val deletes = deleteFiles(metadataPath, snapshotId)
    val posDeletes = deletes.filter(_.content == 1).map(_.path)
    val eqDeletes = deletes.filter(_.content == 2)
    var out = base
    if (posDeletes.nonEmpty)
      out = applyPositionDeletes(spark, out, posDeletes, schema)
    if (eqDeletes.nonEmpty)
      out = applyEqualityDeletes(spark, out, eqDeletes, fs, metadataPath,
        schema)
    out
  }

  /** v2 merge-on-read: anti-join the scan against its position-delete
    * files on (data file path, row position). Spark's parquet metadata
    * columns supply both sides of the key with zero extra I/O
    * (`_metadata.file_path` / `_metadata.row_index`), so this is one
    * distributed hash anti-join — no per-file bitmap materialization on
    * the driver, which is what keeps it viable when a 100 TB table
    * carries millions of delete rows. AQE broadcasts the delete side
    * when it is small (the common case).
    */
  private def applyPositionDeletes(spark: SparkSession, base: DataFrame,
      deleteFiles: Seq[String], schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    // spec stores full URIs; the scan's _metadata.file_path is the
    // filesystem's canonical URI — drop scheme AND leading slashes on
    // both sides so file:/x, file:///x, /x, and the engine's own
    // scheme-less delete rows (RowIds.normalizePathStr) all compare
    // equal
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^([a-zA-Z0-9.+-]+:)?/+", "")
    val dels = spark.read.parquet(deleteFiles.map(localPath): _*)
      .select(norm(col("file_path")).as("__del_file"),
        col("pos").cast("long").as("__del_pos"))
    val withPos = base
      .withColumn("__file", norm(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
    withPos.join(dels,
        withPos("__file") === dels("__del_file") &&
          withPos("__pos") === dels("__del_pos"),
        "left_anti")
      .select(schema.fieldNames.map(col): _*)
  }

  /** v2 merge-on-read equality deletes: a delete row removes every data
    * row whose values on the delete file's `equality_ids` columns are
    * (null-safely) equal AND whose data file has a strictly older data
    * sequence number than the delete file (the spec's scoping rule —
    * rows written by the same or a later commit survive). Position
    * deletes need no such gate because they name explicit file paths.
    *
    * Shape at scale: one broadcast join attaches per-file sequence
    * numbers to the scan via `_metadata.file_path` (file count is
    * metadata-scale), then one hash anti-join per distinct equality-id
    * set — the delete side stays distributed, nothing is collected.
    */
  private def applyEqualityDeletes(spark: SparkSession, base: DataFrame,
      eqDeletes: Seq[DeleteFileRef], dataRefs: Seq[DataFileRef],
      metadataPath: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nameById = fieldDefs(metadataPath).map(f => f.id -> f.name).toMap

    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^file:/+", "/")
    val seqDf = dataRefs.map(f => (localPath(f.path), f.seq))
      .toDF("__seq_file", "__data_seq")
    var out = base
      .withColumn("__eq_file", norm(col("_metadata.file_path")))
      .join(broadcast(seqDf), col("__eq_file") === col("__seq_file"), "left")

    eqDeletes.groupBy(_.equalityIds).foreach { case (ids, group) =>
      val names = ids.map(id => nameById.getOrElse(id,
        throw new IllegalArgumentException(
          s"equality_id $id is not a top-level field of $metadataPath")))
      // one scan per distinct (ids, seq); delete-file counts are
      // metadata-scale, and same-seq files share a single scan
      val delDf = group.groupBy(_.seq).map { case (seq, refs) =>
        spark.read.parquet(refs.map(r => localPath(r.path)): _*)
          .select(names.map(col): _*)
          .withColumn("__del_seq", lit(seq))
      }.reduce(_ unionByName _)
      val renamed = names.foldLeft(delDf)(
        (d, c) => d.withColumnRenamed(c, s"__del_$c"))
      val cond = names.map(c => col(c) <=> col(s"__del_$c"))
        .reduce(_ && _) && col("__data_seq") < col("__del_seq")
      out = out.join(renamed, cond, "left_anti")
    }
    out.select(schema.fieldNames.map(col): _*)
  }
}
