package graft.lake

import java.io.File
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.LocalDate
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types._

/** Export a [[LakeTable]] snapshot as Apache Iceberg v2 metadata
  * (metadata.json + Avro manifest-list + manifest), referencing the
  * table's existing Parquet files in place — the inverse of
  * [[graft.sources.IcebergSnapshot]] and the analogue of the
  * reference's catalog-export path
  * (pg_lake_iceberg/src/iceberg/write_table_metadata.c,
  * write_manifest.c, avro/avro_writer.c).
  *
  * Fidelity so external engines can PRUNE, not just read:
  *  - manifest entries carry per-file `value_counts`,
  *    `null_value_counts`, `lower_bounds`, `upper_bounds` (Iceberg
  *    single-value serialization, [[IcebergValues]]) straight from the
  *    table's own file stats — the same stats the reference emits from
  *    write_manifest.c;
  *  - the REAL partition spec is exported (identity/temporal/bucket/
  *    truncate mapped to Iceberg transform names, our order-preserving
  *    temporal encodings re-encoded to the spec's epoch-relative ints)
  *    with each file's partition tuple in the manifest, whenever every
  *    live file maps to exactly one partition; otherwise the export
  *    falls back to the always-correct unpartitioned spec-0;
  *  - a `version-hint.text` is maintained next to the numbered
  *    metadata files (HadoopTables/object-store catalog convention,
  *    reference object_store_catalog.c:30-45) so external engines can
  *    attach to the CURRENT version by a stable path.
  *
  * New data files embed parquet field-ids (LakeTable.writeData); the
  * `schema.name-mapping.default` property still covers files written
  * before that.
  */
object IcebergExport {

  private val ManifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin)

  /** Long-keyed map fields encode as array<record{key,value}> with
    * logicalType map — Avro maps require string keys, Iceberg's are
    * field-id ints (spec: Appendix A, manifests).
    */
  private def kvMapSchema(recName: String, keyId: Int, valueId: Int,
      valueType: String): String =
    s"""["null",{"type":"array","items":{"type":"record","name":"$recName",
       |"fields":[{"name":"key","type":"int","field-id":$keyId},
       |{"name":"value","type":"$valueType","field-id":$valueId}]},
       |"logicalType":"map"}]""".stripMargin.replaceAll("\n", "")

  /** Manifest entry schema with a per-table partition record. */
  private def entrySchema(partFields: Seq[(String, String, Int)]): Schema = {
    val partJson = partFields.map { case (name, avroType, fieldId) =>
      s"""{"name":"$name","type":["null","$avroType"],"default":null,""" +
        s""""field-id":$fieldId}"""
    }.mkString("[", ",", "]")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |  {"name":"content","type":"int","field-id":134},
         |  {"name":"file_path","type":"string","field-id":100},
         |  {"name":"file_format","type":"string","field-id":101},
         |  {"name":"partition","type":{"type":"record","name":"r102","fields":$partJson},"field-id":102},
         |  {"name":"record_count","type":"long","field-id":103},
         |  {"name":"file_size_in_bytes","type":"long","field-id":104},
         |  {"name":"value_counts","type":${kvMapSchema("k119_v120", 119, 120, "long")},"default":null,"field-id":109},
         |  {"name":"null_value_counts","type":${kvMapSchema("k121_v122", 121, 122, "long")},"default":null,"field-id":110},
         |  {"name":"lower_bounds","type":${kvMapSchema("k126_v127", 126, 127, "bytes")},"default":null,"field-id":125},
         |  {"name":"upper_bounds","type":${kvMapSchema("k129_v130", 129, 130, "bytes")},"default":null,"field-id":128}
         |]},"field-id":2}]}""".stripMargin)
  }

  private def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"cannot export type $other")
  }

  // ---- partition spec mapping -------------------------------------------

  /** Avro type of a partition field's value for one of our transforms
    * (spec: identity/truncate keep the source type; temporal + bucket
    * are int). None = transform/source combination we can't export.
    */
  private def partAvroType(t: PartitionTransform,
      src: DataType): Option[String] = t match {
    case _: YearT | _: MonthT | _: DayT | _: HourT | _: BucketT => Some("int")
    case _: IdentityT | _: TruncateT => src match {
      case BooleanType => Some("boolean")
      case ByteType | ShortType | IntegerType | DateType => Some("int")
      case LongType | TimestampType | TimestampNTZType => Some("long")
      case FloatType => Some("float")
      case DoubleType => Some("double")
      case StringType => Some("string")
      case _ => None
    }
  }

  private def icebergTransformName(t: PartitionTransform): String = t match {
    case _: IdentityT => "identity"
    case _: YearT => "year"
    case _: MonthT => "month"
    case _: DayT => "day"
    case _: HourT => "hour"
    case BucketT(n, _) => s"bucket[$n]"
    case TruncateT(w, _) => s"truncate[$w]"
  }

  /** Our stored partition-stat string → the Iceberg transform value
    * (our temporal encodings are order-preserving literals like
    * 19970714; the spec wants epoch-relative ints). None when the
    * value can't be represented.
    */
  private def icebergPartValue(t: PartitionTransform, stat: String,
      src: DataType): Option[AnyRef] = t match {
    case _: YearT => Some(Int.box(stat.toInt - 1970))
    case _: MonthT =>
      val v = stat.toLong
      Some(Int.box(((v / 100 - 1970) * 12 + (v % 100 - 1)).toInt))
    case _: DayT =>
      val v = stat.toLong
      Some(Int.box(LocalDate.of((v / 10000).toInt, (v / 100 % 100).toInt,
        (v % 100).toInt).toEpochDay.toInt))
    case _: HourT =>
      val v = stat.toLong
      val d = v / 100
      val epochDay = LocalDate.of((d / 10000).toInt, (d / 100 % 100).toInt,
        (d % 100).toInt).toEpochDay
      Some(Int.box((epochDay * 24 + v % 100).toInt))
    case _: BucketT => Some(Int.box(stat.toInt))
    case TruncateT(_, _) => src match {
      case StringType => Some(stat)
      case LongType => Some(Long.box(stat.toLong))
      case ByteType | ShortType | IntegerType => Some(Int.box(stat.toInt))
      case _ => None
    }
    case _: IdentityT => IcebergValues.parse(stat, src) match {
      case null => None
      case i: Int => Some(Int.box(i))
      case l: Long => Some(Long.box(l))
      case b: Boolean => Some(Boolean.box(b))
      case f: Float => Some(Float.box(f))
      case d: Double => Some(Double.box(d))
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case _ => None
    }
  }

  private def writeAvro(path: String, schema: Schema,
      records: Seq[GenericRecord], meta: Map[String, String]): Long = {
    // write-temp + atomic rename: concurrent exports of the same
    // snapshot rewrite the same manifest paths, and a concurrent
    // reader (REST-append client walking the current list) must never
    // see a torn avro
    val target = Paths.get(path)
    val tmp = Files.createTempFile(target.getParent, "avro", ".tmp")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, tmp.toFile)
    records.foreach(w.append)
    w.close()
    Files.move(tmp, target,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    Files.size(target)
  }

  /** Concatenate two manifest-list files into `out` — the REST-append
    * client's union step: an Iceberg snapshot's manifest list is the
    * table's FULL state, so an append commit must carry the target's
    * current manifests alongside the freshly staged one
    * ([[graft.LakeEngine.insertIntoRestTable]]). Records copy field-
    * by-name onto `add`'s schema; a base entry with a field the add
    * schema lacks refuses loudly rather than dropping metadata.
    */
  def concatManifestLists(base: String, add: String, out: String): Unit = {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.GenericDatumReader
    def readAll(p: String): (Schema, Seq[GenericRecord]) = {
      val r = new DataFileReader(new File(p.stripPrefix("file://")),
        new GenericDatumReader[GenericRecord]())
      val recs = Seq.newBuilder[GenericRecord]
      while (r.hasNext) recs += r.next()
      val s = r.getSchema
      r.close()
      (s, recs.result())
    }
    val (addSchema, addRecs) = readAll(add)
    val (baseSchema, baseRecs) = readAll(base)
    val addFields = addSchema.getFields.asScala.map(_.name()).toSet
    val rebased = baseRecs.map { r =>
      baseSchema.getFields.asScala.foreach { f =>
        require(addFields.contains(f.name()) || r.get(f.name()) == null,
          s"manifest-list entry field ${f.name()} of $base cannot be " +
            "represented in the staged list's schema")
      }
      val n = new GenericData.Record(addSchema)
      addSchema.getFields.asScala.foreach { f =>
        if (baseSchema.getField(f.name()) != null)
          n.put(f.name(), r.get(f.name()))
      }
      n
    }
    writeAvro(out.stripPrefix("file://"), addSchema,
      addRecs ++ rebased, Map.empty)
    ()
  }

  /** Build one key→value avro "map" (array of kv records). */
  private def kvArray(schema: Schema, entries: Seq[(Int, AnyRef)]): AnyRef = {
    val arraySchema = schema.getTypes.get(1) // ["null", array]
    val itemSchema = arraySchema.getElementType
    val arr = new GenericData.Array[GenericRecord](entries.size, arraySchema)
    entries.foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k)
      r.put("value", v)
      arr.add(r)
    }
    arr
  }

  /** Write Iceberg metadata for the CURRENT snapshot under
    * `<table location>/iceberg-metadata/`; returns the metadata.json
    * path, directly consumable by IcebergSnapshot.read or external
    * Iceberg tooling. `version-hint.text` always names the newest
    * export.
    */
  def export(table: LakeTable): String = export(table, table.meta)

  /** Export a SPECIFIC metadata state of the table — the REST catalog
    * passes the engine's committed view here, so external readers
    * never see in-transaction staged metadata and a multi-table
    * COMMIT's participants stay at their pre-transaction state until
    * the whole commit lands ([[graft.LakeEngine.committedView]]).
    */
  def export(table: LakeTable, m0: TableMetadata): String = {
    // the exported metadata embeds file:// URIs (what external readers
    // string-match), so export is defined for local / POSIX-shared
    // locations; a remote-scheme table refuses loudly rather than
    // exporting URIs no external engine could resolve. Remote tables
    // publish through the REST catalog surface instead.
    if (LakeFs.isRemote(table.location))
      throw new UnsupportedOperationException(
        "iceberg export of a table at a remote-scheme location is not " +
          s"supported (location: ${table.location}); use the REST " +
          "catalog export or a shared POSIX mount")
    val m = m0
    val snap = m.currentSnapshot.getOrElse(
      throw new IllegalStateException("no snapshot to export"))
    // outstanding merge-on-read state exports as a real v2 delete
    // manifest (content=1); our delete parquets already use the spec's
    // (file_path, pos) column names
    val fields = m.currentSchema.fields
    val typesById: Map[Int, DataType] =
      fields.map(f => f.id -> DataType.fromDDL(f.dataType)).toMap
    val idsByName: Map[String, Int] = fields.map(f => f.name -> f.id).toMap

    val dir = Paths.get(table.location, "iceberg-metadata")
    Files.createDirectories(dir)
    val snapshotId = snap.id
    val seq = 1L

    // ---- partition spec: real when every file maps to ONE partition --
    val transforms = m.transforms
    val partPlan: Option[Seq[(PartitionTransform, DataType, String, Int)]] =
      if (transforms.isEmpty) None
      else {
        val plan = transforms.zipWithIndex.flatMap { case (t, i) =>
          val src = typesById(idsByName(t.column))
          partAvroType(t, src).map(av => (t, src, av, 1000 + i))
        }
        val exportable = plan.size == transforms.size &&
          snap.dataFiles.forall(fe => transforms.forall { t =>
            fe.partStats.get(t.valueName).exists(st =>
              st.min.isDefined && st.min == st.max)
          })
        if (exportable) Some(plan) else None
      }

    val partFields = partPlan.getOrElse(Nil).map { case (t, _, av, fid) =>
      (t.valueName, av, fid)
    }
    val eSchema = entrySchema(partFields)
    val dfSchema = eSchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()

    val entries = snap.dataFiles.map { fe =>
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", "file://" + fe.path)
      df.put("file_format", "PARQUET")
      val part = new GenericData.Record(partSchema)
      partPlan.getOrElse(Nil).foreach { case (t, src, _, _) =>
        val stat = fe.partStats(t.valueName).min.get
        part.put(t.valueName, icebergPartValue(t, stat, src).orNull)
      }
      df.put("partition", part)
      df.put("record_count", fe.rows)
      df.put("file_size_in_bytes", fe.bytes)

      // stats: only fields whose id exists in this file's recorded
      // stats AND in the current schema (dropped columns export no
      // stats; files from older schema versions contribute what they
      // have)
      val statFields = fields.flatMap(f =>
        fe.fieldStats.get(f.id.toString).map(f -> _))
      df.put("value_counts", kvArray(dfSchema.getField("value_counts").schema(),
        statFields.map { case (f, _) => f.id -> Long.box(fe.rows) }))
      df.put("null_value_counts",
        kvArray(dfSchema.getField("null_value_counts").schema(),
          statFields.map { case (f, st) => f.id -> Long.box(st.nullCount) }))
      def bounds(sel: ColStats => Option[String]): Seq[(Int, AnyRef)] =
        statFields.flatMap { case (f, st) =>
          sel(st).flatMap(s => IcebergValues.toBytes(s, typesById(f.id)))
            .map(b => f.id -> ByteBuffer.wrap(b))
        }
      df.put("lower_bounds",
        kvArray(dfSchema.getField("lower_bounds").schema(), bounds(_.min)))
      df.put("upper_bounds",
        kvArray(dfSchema.getField("upper_bounds").schema(), bounds(_.max)))

      val e = new GenericData.Record(eSchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      e.put("data_file", df)
      e
    }

    val icebergSchemaJson = {
      val fs = fields.map { f =>
        val dt = DataType.fromDDL(f.dataType)
        s"""{"id":${f.id},"name":"${f.name}","required":false,""" +
          s""""type":"${icebergType(dt)}"}"""
      }.mkString("[", ",", "]")
      s"""{"type":"struct","schema-id":0,"fields":$fs}"""
    }

    val specFieldsJson = partPlan.getOrElse(Nil).map { case (t, _, _, fid) =>
      s"""{"name":"${t.valueName}","transform":"${icebergTransformName(t)}",""" +
        s""""source-id":${idsByName(t.column)},"field-id":$fid}"""
    }.mkString("[", ",", "]")
    val lastPartitionId =
      partPlan.getOrElse(Nil).lastOption.map(_._4).getOrElse(999)

    val manifestPath = dir.resolve(s"manifest-$snapshotId.avro").toString
    val manifestLen = writeAvro(manifestPath, eSchema, entries, Map(
      "schema" -> icebergSchemaJson,
      "partition-spec" -> specFieldsJson,
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "data"))

    // outstanding position deletes: a second manifest with content=1
    // entries at a HIGHER sequence number, so readers apply them to
    // every data file (spec: deletes hit data with data_seq ≤ del_seq)
    val delSeq = seq + 1
    val deleteManifest: Option[(String, Long)] =
      if (snap.deleteFiles.isEmpty) None
      else {
        // The spec requires each position-delete row's file_path to
        // EQUAL the data file's manifest location string, and the
        // delete columns to carry the reserved field ids (2147483546
        // file_path, 2147483545 pos). Internally delete parquets store
        // normalized scheme-less paths (engine-side joins normalize
        // both sides — RowIds.normalizePath), so export rewrites a
        // spec-exact COPY of each delete parquet under the metadata
        // dir with manifest URIs and the reserved ids embedded; a
        // genuine external reader (Spark+Iceberg, Trino, DuckDB)
        // string-matches these against the data manifest entries.
        val F = org.apache.spark.sql.functions
        val uriByNorm = snap.dataFiles
          .map(fe => RowIds.normalizePathStr(fe.path) -> ("file://" + fe.path))
          .toMap
        val fpMeta = new MetadataBuilder()
          .putLong("parquet.field.id", 2147483546L).build()
        val posMeta = new MetadataBuilder()
          .putLong("parquet.field.id", 2147483545L).build()
        val spark = table.spark
        val rewritten: Seq[(String, Long, Long)] =
          snap.deleteFiles.zipWithIndex.map { case (fe, i) =>
            val mapped = F.element_at(F.typedLit(uriByNorm), F.col("file_path"))
            val out = spark.read.parquet(fe.path)
              .select(
                F.when(mapped.isNull, F.raise_error(F.concat(
                    F.lit("delete row references a data file not in this " +
                      "snapshot: "), F.col("file_path"))))
                  .otherwise(mapped).as("file_path", fpMeta),
                F.col("pos").cast("long").as("pos", posMeta))
              .coalesce(1)
            val tmp = dir.resolve(s"delete-tmp-$snapshotId-$i")
            out.write.mode("overwrite").parquet(tmp.toString)
            val part = {
              val s = Files.list(tmp)
              try s.iterator().asScala
                .filter(_.toString.endsWith(".parquet")).toSeq.head
              finally s.close()
            }
            val dst = dir.resolve(s"delete-$snapshotId-$i.parquet")
            Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
            val walk = Files.walk(tmp)
            try walk.iterator().asScala.toSeq.reverse
              .foreach(Files.deleteIfExists)
            finally walk.close()
            (dst.toString, fe.rows, Files.size(dst))
          }
        val delEntries = rewritten.map { case (p, rows, bytes) =>
          val df = new GenericData.Record(dfSchema)
          df.put("content", 1)
          df.put("file_path", "file://" + p)
          df.put("file_format", "PARQUET")
          df.put("partition", new GenericData.Record(partSchema))
          df.put("record_count", rows)
          df.put("file_size_in_bytes", bytes)
          val e = new GenericData.Record(eSchema)
          e.put("status", 1)
          e.put("snapshot_id", snapshotId)
          e.put("sequence_number", delSeq)
          e.put("file_sequence_number", delSeq)
          e.put("data_file", df)
          e
        }
        val p = dir.resolve(s"manifest-$snapshotId-deletes.avro").toString
        val len = writeAvro(p, eSchema, delEntries, Map(
          "schema" -> icebergSchemaJson,
          "partition-spec" -> specFieldsJson,
          "partition-spec-id" -> "0",
          "format-version" -> "2",
          "content" -> "deletes"))
        Some((p, len))
      }

    // manifest list
    val ml = new GenericData.Record(ManifestListSchema)
    ml.put("manifest_path", "file://" + manifestPath)
    ml.put("manifest_length", manifestLen)
    ml.put("partition_spec_id", 0)
    ml.put("content", 0)
    ml.put("sequence_number", seq)
    ml.put("min_sequence_number", seq)
    ml.put("added_snapshot_id", snapshotId)
    ml.put("added_files_count", snap.dataFiles.size)
    ml.put("existing_files_count", 0)
    ml.put("deleted_files_count", 0)
    ml.put("added_rows_count", snap.dataFiles.map(_.rows).sum)
    ml.put("existing_rows_count", 0L)
    ml.put("deleted_rows_count", 0L)
    val mls = Seq(ml) ++ deleteManifest.map { case (p, len) =>
      val d = new GenericData.Record(ManifestListSchema)
      d.put("manifest_path", "file://" + p)
      d.put("manifest_length", len)
      d.put("partition_spec_id", 0)
      d.put("content", 1)
      d.put("sequence_number", delSeq)
      d.put("min_sequence_number", delSeq)
      d.put("added_snapshot_id", snapshotId)
      d.put("added_files_count", snap.deleteFiles.size)
      d.put("existing_files_count", 0)
      d.put("deleted_files_count", 0)
      d.put("added_rows_count", snap.deleteFiles.map(_.rows).sum)
      d.put("existing_rows_count", 0L)
      d.put("deleted_rows_count", 0L)
      d
    }
    val mlPath = dir.resolve(s"snap-$snapshotId.avro").toString
    writeAvro(mlPath, ManifestListSchema, mls, Map(
      "format-version" -> "2"))

    // name mapping: files written before field-id embedding carry no
    // parquet field-ids; the mapping keeps them readable by id
    val nameMapping = fields.map(f =>
      s"""{"field-id":${f.id},"names":["${f.name}"]}""")
      .mkString("[", ",", "]")

    val now = System.currentTimeMillis()
    val metadataJson =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "${UUID.randomUUID()}",
         |  "location": "file://${table.location}",
         |  "last-sequence-number": ${if (snap.deleteFiles.isEmpty) seq else delSeq},
         |  "last-updated-ms": $now,
         |  "last-column-id": ${m.nextFieldId - 1},
         |  "schemas": [$icebergSchemaJson],
         |  "current-schema-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": $specFieldsJson}],
         |  "default-spec-id": 0,
         |  "last-partition-id": $lastPartitionId,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "default-sort-order-id": 0,
         |  "properties": {"schema.name-mapping.default": ${
            com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
              .writeValueAsString(nameMapping)}},
         |  "current-snapshot-id": $snapshotId,
         |  "snapshots": [{
         |    "snapshot-id": $snapshotId,
         |    "sequence-number": ${if (snap.deleteFiles.isEmpty) seq else delSeq},
         |    "timestamp-ms": $now,
         |    "manifest-list": "file://$mlPath",
         |    "summary": {"operation": "append"},
         |    "schema-id": 0
         |  }],
         |  "snapshot-log": [],
         |  "metadata-log": []
         |}""".stripMargin
    val metaPath = dir.resolve(s"v$snapshotId.metadata.json")
    // atomic publish: concurrent exports of the same snapshot (two
    // REST LoadTable calls racing) must never expose a torn file to a
    // concurrent reader
    val metaTmp = Files.createTempFile(dir, "meta", ".tmp")
    Files.write(metaTmp, metadataJson.getBytes)
    Files.move(metaTmp, metaPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // stable attach point (HadoopTables / object-store catalog
    // convention): version-hint.text names the current metadata file
    val hintTmp = Files.createTempFile(dir, "hint", ".tmp")
    Files.write(hintTmp, metaPath.getFileName.toString.getBytes)
    Files.move(hintTmp, dir.resolve("version-hint.text"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    metaPath.toString
  }

  /** Resolve a table's current exported metadata.json via
    * version-hint.text (the object-store catalog attach path).
    */
  def currentMetadata(tableLocation: String): Option[String] = {
    val dir = Paths.get(tableLocation, "iceberg-metadata")
    val hint = dir.resolve("version-hint.text")
    if (!Files.exists(hint)) None
    else Some(dir.resolve(new String(Files.readAllBytes(hint)).trim).toString)
  }
}
