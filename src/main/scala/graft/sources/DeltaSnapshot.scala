package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Delta Lake table scan (SURVEY.md §2.1 `delta_scan`; reference gates
  * it behind a build flag the same way — pg_lake_engine/src/pgduck/
  * read_data.c:297-317). No delta jar is needed for reading: state is
  * resolved from the transaction log per the public protocol —
  *
  *  1. `_delta_log/_last_checkpoint` names the newest checkpoint
  *     version; the checkpoint parquet (single or multi-part) carries
  *     the compacted action state. It is read as a distributed Spark
  *     job (a checkpoint at large table size is millions of rows) and
  *     only (path, partitionValues) project back to the driver.
  *  2. JSON commits AFTER the checkpoint version replay on top.
  *  3. Without a checkpoint, the JSON log must be CONTIGUOUS from
  *     version 0 — a cleaned log without a checkpoint would silently
  *     drop early adds, the worst failure mode, so it is refused.
  *
  * Partition columns are reconstructed from each file's
  * `partitionValues` (Delta data files do not store them): files group
  * by partition tuple, each group scans with the data schema plus
  * literal partition values cast through the table schema.
  *
  * Rejected explicitly: deletion vectors, column mapping.
  */
object DeltaSnapshot {

  private val mapper = new ObjectMapper()

  final case class State(
      schemaJson: String,
      partitionColumns: Seq[String],
      files: Map[String, Map[String, Option[String]]])

  private def requireNoDv(dv: JsonNode): Unit =
    require(dv == null || dv.isNull, "delta deletion vectors unsupported")

  private def checkMapping(conf: JsonNode): Unit = {
    val mode = Option(conf).flatMap(c =>
      Option(c.get("delta.columnMapping.mode"))).map(_.asText())
      .getOrElse("none")
    require(mode == "none", "delta column mapping unsupported")
  }

  private def partValuesOf(node: JsonNode): Map[String, Option[String]] =
    Option(node).map(_.fields().asScala.map { e =>
      e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
    }.toMap).getOrElse(Map.empty)

  def resolve(spark: SparkSession, tableDir: String): State = {
    val logDir = Paths.get(tableDir, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $tableDir")

    var schemaJson: String = null
    var partCols: Seq[String] = Nil
    var files = Map.empty[String, Map[String, Option[String]]]

    // ---- 1. checkpoint base state -----------------------------------
    val lastCp = logDir.resolve("_last_checkpoint")
    val cpVersion: Option[Long] = if (Files.exists(lastCp)) {
      val node = mapper.readTree(new String(Files.readAllBytes(lastCp)))
      Some(node.get("version").asLong())
    } else None

    cpVersion.foreach { v =>
      val prefix = f"$v%020d.checkpoint"
      val parts = {
        val s = Files.list(logDir)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith(prefix) && n.endsWith(".parquet"))
          .toSeq.sorted
        finally s.close()
      }
      require(parts.nonEmpty,
        s"_last_checkpoint names version $v but no $prefix*.parquet exists")
      val cp = spark.read.parquet(parts.map(p => s"$logDir/$p"): _*)

      val mdRows = cp.filter(col("metaData").isNotNull)
        .select("metaData.schemaString", "metaData.partitionColumns",
          "metaData.configuration")
        .collect()
      mdRows.lastOption.foreach { r =>
        schemaJson = r.getString(0)
        partCols = Option(r.getSeq[String](1)).getOrElse(Nil)
        val conf = Option(r.getMap[String, String](2)).getOrElse(Map.empty)
        require(conf.getOrElse("delta.columnMapping.mode", "none") == "none",
          "delta column mapping unsupported")
      }

      val hasDv = cp.select("add.*").schema.fieldNames.contains("deletionVector")
      if (hasDv)
        require(cp.filter(col("add").isNotNull &&
            col("add.deletionVector").isNotNull).isEmpty,
          "delta deletion vectors unsupported")
      val addRows = cp.filter(col("add").isNotNull)
        .select("add.path", "add.partitionValues").collect()
      files = addRows.map { r =>
        val pv = Option(r.getMap[String, String](1))
          .map(_.map { case (k, x) => k -> Option(x) }.toMap)
          .getOrElse(Map.empty[String, Option[String]])
        r.getString(0) -> pv
      }.toMap
      // live remove tombstones in the checkpoint only matter for vacuum
      // bookkeeping; a path is never simultaneously live-add and
      // tombstoned in a valid checkpoint.
    }

    // ---- 2. JSON commits after the checkpoint -----------------------
    val vPat = "(\\d{20})\\.json".r
    val commitVersions: Seq[(Long, Path)] = {
      val s = Files.list(logDir)
      try s.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case vPat(n) => Some(n.toLong -> p)
          case _ => None
        }
      }.toSeq.sortBy(_._1)
      finally s.close()
    }
    val replay = commitVersions.filter(_._1 > cpVersion.getOrElse(-1L))

    // contiguity: a gap (cleaned log) means silently-missing state
    cpVersion match {
      case None =>
        val vs = replay.map(_._1)
        require(vs.nonEmpty, s"empty delta log at $logDir")
        require(vs.head == 0L && vs == (0L until vs.size.toLong),
          s"delta log at $logDir is not contiguous from 0 and has no " +
            "checkpoint - refusing a partial (silently wrong) scan")
      case Some(v) =>
        val vs = replay.map(_._1)
        require(vs == (v + 1 to v + vs.size),
          s"delta log gap after checkpoint $v at $logDir")
    }

    for ((_, commit) <- replay;
        line <- Files.readAllLines(commit).asScala if line.trim.nonEmpty) {
      val node = mapper.readTree(line)
      if (node.has("metaData")) {
        val md = node.get("metaData")
        schemaJson = md.get("schemaString").asText()
        partCols = Option(md.get("partitionColumns"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        checkMapping(md.get("configuration"))
      }
      if (node.has("add")) {
        val add = node.get("add")
        requireNoDv(add.get("deletionVector"))
        files += add.get("path").asText() ->
          partValuesOf(add.get("partitionValues"))
      }
      if (node.has("remove"))
        files -= node.get("remove").get("path").asText()
    }
    require(schemaJson != null, s"no metaData action found in $logDir")
    State(schemaJson, partCols, files)
  }

  def schemaOf(spark: SparkSession, tableDir: String): StructType =
    DataType.fromJson(resolve(spark, tableDir).schemaJson)
      .asInstanceOf[StructType]

  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val st = resolve(spark, tableDir)
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    if (st.files.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)

    if (st.partitionColumns.isEmpty)
      return spark.read.schema(schema)
        .parquet(st.files.keysIterator.toSeq.sorted.map(f => s"$tableDir/$f"): _*)

    // partition-column reconstruction: group by partition tuple, scan
    // each group with the data schema, attach literal values cast
    // through the table schema. Group count = distinct partition tuples
    // present — the same driver-side cardinality any Delta reader holds.
    val partSet = st.partitionColumns.toSet
    val dataSchema = StructType(schema.fields.filterNot(f =>
      partSet.contains(f.name)))
    val byTuple = st.files.toSeq
      .groupBy { case (_, pv) => st.partitionColumns.map(pv.getOrElse(_, None)) }
    val frames = byTuple.toSeq.sortBy(_._1.mkString(" "))
      .map { case (values, group) =>
        val paths = group.map(_._1).sorted.map(f => s"$tableDir/$f")
        val base = spark.read.schema(dataSchema).parquet(paths: _*)
        st.partitionColumns.zip(values).foldLeft(base) {
          case (df, (name, v)) =>
            val f = schema(name)
            df.withColumn(name,
              v.map(s => lit(s).cast(f.dataType))
                .getOrElse(lit(null).cast(f.dataType)))
        }
      }
    frames.reduce(_ unionAll _).select(schema.fieldNames.map(col): _*)
  }
}
