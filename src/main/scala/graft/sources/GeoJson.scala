package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.functions.Geometry
import graft.functions.Geometry._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** GeoJSON scan (SURVEY.md §2.1 "GDAL/geo scan"). The reference reads
  * GeoJSON/Shapefile/GPKG through GDAL
  * (docs/file-formats-reference.md:96-140); GDAL does not exist here, so
  * the GeoJSON layer — the only text-based, self-describing format of
  * that set — is implemented natively: RFC 7946 FeatureCollection /
  * Feature / bare-geometry documents become rows of
  * `(geometry wkb, geom_type, properties map<string,string>, filename)`.
  *
  * Scale shape: `wholetext` text scan distributes one task per FILE
  * (GeoJSON is a single JSON document — there is no intra-file split),
  * and parsing runs in executors via flatMap; a directory of thousands
  * of GeoJSON files parallelizes like any file source. The WKB geometry
  * column feeds the st_* function layer directly.
  */
object GeoJson {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("filename"),
        col("value"))
      .as[(String, String)]
    raw.flatMap { case (file, text) =>
      parseFeatures(text).map { case (wkb, gtype, props) =>
        (wkb, gtype, props, file)
      }
    }.toDF("geometry", "geom_type", "properties", "filename")
  }

  /** GeoJSONSeq scan (`.geojsons`/`.geojsonl`,
    * docs/file-formats-reference.md:109): newline-delimited Feature
    * documents, optionally RS-prefixed (RFC 8142). Unlike whole-file
    * GeoJSON this is LINE-splittable, so Spark's text reader gives
    * intra-file parallelism for free — the one geo format that scales
    * within a single large file.
    */
  def readSeq(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("filename"),
        col("value"))
      .as[(String, String)]
    raw.flatMap { case (file, line) =>
      val t = line.stripPrefix("\u001e").trim // RFC 8142 RS framing
      if (t.isEmpty) Nil
      else parseFeatures(t).map { case (wkb, gtype, props) =>
        (wkb, gtype, props, file)
      }
    }.toDF("geometry", "geom_type", "properties", "filename")
  }

  /** Parse one GeoJSON document into (wkb, geometry-type, properties). */
  def parseFeatures(text: String):
      Seq[(Array[Byte], String, Map[String, String])] = {
    val root = new ObjectMapper().readTree(text)
    val out = ArrayBuffer.empty[(Array[Byte], String, Map[String, String])]
    def feature(node: JsonNode): Unit = {
      val geomNode = node.get("geometry")
      if (geomNode != null && !geomNode.isNull) {
        val g = parseGeometry(geomNode)
        out += ((toWkb(g), Geometry.geometryType(g), propsOf(node)))
      }
    }
    root.path("type").asText() match {
      case "FeatureCollection" =>
        root.path("features").elements().asScala.foreach(feature)
      case "Feature" => feature(root)
      case _ => // bare geometry document
        val g = parseGeometry(root)
        out += ((toWkb(g), Geometry.geometryType(g), Map.empty[String, String]))
    }
    out.toSeq
  }

  private def propsOf(featureNode: JsonNode): Map[String, String] = {
    val p = featureNode.get("properties")
    if (p == null || p.isNull) Map.empty
    else p.properties().asScala.map { e =>
      val v = e.getValue
      // scalars render as plain text; nested values keep their JSON form
      e.getKey -> (if (v.isTextual) v.asText() else v.toString)
    }.toMap
  }

  /** RFC 7946 geometry JSON text → [[Geometry.Geom]]
    * (st_geomfromgeojson).
    */
  def parseGeometryString(text: String): Geom =
    parseGeometry(new ObjectMapper().readTree(text))

  /** RFC 7946 geometry object → [[Geometry.Geom]]. */
  def parseGeometry(node: JsonNode): Geom = {
    def pt(n: JsonNode): Pt = Pt(n.get(0).asDouble(), n.get(1).asDouble())
    def pts(n: JsonNode): IndexedSeq[Pt] =
      n.elements().asScala.map(pt).toIndexedSeq
    def rings(n: JsonNode): IndexedSeq[IndexedSeq[Pt]] =
      n.elements().asScala.map(pts).toIndexedSeq
    val coords = node.get("coordinates")
    node.path("type").asText() match {
      case "Point" =>
        if (coords == null || coords.isEmpty) GPoint(None)
        else GPoint(Some(pt(coords)))
      case "MultiPoint" => GMultiPoint(pts(coords))
      case "LineString" => GLine(pts(coords))
      case "MultiLineString" => GMultiLine(rings(coords))
      case "Polygon" => GPolygon(rings(coords))
      case "MultiPolygon" =>
        GMultiPolygon(coords.elements().asScala.map(rings).toIndexedSeq)
      case "GeometryCollection" =>
        GCollection(node.path("geometries").elements().asScala
          .map(parseGeometry).toIndexedSeq)
      case t => throw new IllegalArgumentException(
        s"unknown GeoJSON geometry type '$t'")
    }
  }
}
