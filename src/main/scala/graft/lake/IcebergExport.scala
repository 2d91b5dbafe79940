package graft.lake

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.UUID
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
  * write_manifest.c, avro/avro_writer.c). The export is unpartitioned
  * (spec-id 0, empty partition tuple): results are identical, external
  * engines just don't get our hidden-partition pruning. A
  * `schema.name-mapping.default` property carries field-ids for
  * readers that want them, since the data files were written without
  * embedded parquet field-ids.
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

  private val ManifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","field-id":134},
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104}
      |]},"field-id":2}]}""".stripMargin)

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

  private def writeAvro(path: String, schema: Schema,
      records: Seq[GenericRecord], meta: Map[String, String]): Long = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, new File(path))
    records.foreach(w.append)
    w.close()
    Files.size(Paths.get(path))
  }

  /** Write Iceberg metadata for the CURRENT snapshot under
    * `<table location>/iceberg-metadata/`; returns the metadata.json
    * path, directly consumable by IcebergSnapshot.read or external
    * Iceberg tooling.
    */
  def export(table: LakeTable): String = {
    val m = table.meta
    val snap = m.currentSnapshot.getOrElse(
      throw new IllegalStateException("no snapshot to export"))
    val schema = m.sparkSchema
    val fields = m.currentSchema.fields

    val dir = Paths.get(table.location, "iceberg-metadata")
    Files.createDirectories(dir)
    val snapshotId = snap.id
    val seq = 1L

    // manifest (one, listing every live data file)
    val entrySchema = ManifestEntrySchema
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val entries = snap.files.map { fe =>
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", "file://" + fe.path)
      df.put("file_format", "PARQUET")
      df.put("partition", new GenericData.Record(partSchema))
      df.put("record_count", fe.rows)
      df.put("file_size_in_bytes", fe.bytes)
      val e = new GenericData.Record(entrySchema)
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

    val manifestPath = dir.resolve(s"manifest-$snapshotId.avro").toString
    val manifestLen = writeAvro(manifestPath, entrySchema, entries, Map(
      "schema" -> icebergSchemaJson,
      "partition-spec" -> "[]",
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "data"))

    // manifest list
    val ml = new GenericData.Record(ManifestListSchema)
    ml.put("manifest_path", "file://" + manifestPath)
    ml.put("manifest_length", manifestLen)
    ml.put("partition_spec_id", 0)
    ml.put("content", 0)
    ml.put("sequence_number", seq)
    ml.put("min_sequence_number", seq)
    ml.put("added_snapshot_id", snapshotId)
    ml.put("added_files_count", snap.files.size)
    ml.put("existing_files_count", 0)
    ml.put("deleted_files_count", 0)
    ml.put("added_rows_count", snap.files.map(_.rows).sum)
    ml.put("existing_rows_count", 0L)
    ml.put("deleted_rows_count", 0L)
    val mlPath = dir.resolve(s"snap-$snapshotId.avro").toString
    writeAvro(mlPath, ManifestListSchema, Seq(ml), Map(
      "format-version" -> "2"))

    // name mapping: our parquet has no embedded field-ids, so give
    // iceberg readers the name->id mapping as a table property
    val nameMapping = fields.map(f =>
      s"""{"field-id":${f.id},"names":["${f.name}"]}""")
      .mkString("[", ",", "]")

    val now = System.currentTimeMillis()
    val metadataJson =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "${UUID.randomUUID()}",
         |  "location": "file://${table.location}",
         |  "last-sequence-number": $seq,
         |  "last-updated-ms": $now,
         |  "last-column-id": ${m.nextFieldId - 1},
         |  "schemas": [$icebergSchemaJson],
         |  "current-schema-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "default-spec-id": 0,
         |  "last-partition-id": 999,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "default-sort-order-id": 0,
         |  "properties": {"schema.name-mapping.default": ${
            com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
              .writeValueAsString(nameMapping)}},
         |  "current-snapshot-id": $snapshotId,
         |  "snapshots": [{
         |    "snapshot-id": $snapshotId,
         |    "sequence-number": $seq,
         |    "timestamp-ms": $now,
         |    "manifest-list": "file://$mlPath",
         |    "summary": {"operation": "append"},
         |    "schema-id": 0
         |  }],
         |  "snapshot-log": [],
         |  "metadata-log": []
         |}""".stripMargin
    val metaPath = dir.resolve(s"v$snapshotId.metadata.json")
    Files.write(metaPath, metadataJson.getBytes)
    metaPath.toString
  }
}
