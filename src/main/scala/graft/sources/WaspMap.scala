package graft.sources

import graft.functions.Geometry
import graft.functions.Geometry._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** WAsP `.map` scan — the wind-atlas terrain format row of the
  * reference's GDAL table (docs/file-formats-reference.md:111; OGR's
  * WAsP driver reads the same layout). The format is plain text:
  * a 4-line header (title + projection/extent numbers, free-form),
  * then repeated contour objects — one ATTRIBUTE line whose LAST
  * number is the vertex count and whose leading 1–3 numbers are the
  * contour attributes, followed by that many x/y pairs in free token
  * layout (any number of pairs per line):
  *
  *   - 2 numbers: `elev n`                (elevation contour)
  *   - 3 numbers: `rough_l rough_r n`    (roughness-change line)
  *   - 4 numbers: `rough_l rough_r elev n` (combined)
  *
  * Rows carry a LINESTRING plus the attributes that were present.
  * Token underflow (fewer coordinates than declared) refuses loudly.
  * One task per file (objects span lines), parsing in executors.
  */
object WaspMap {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("filename"),
        col("value"))
      .as[(String, String)]
    raw.flatMap { case (file, text) =>
      parse(text).map { case (wkb, gtype, props) =>
        (wkb, gtype, props, file)
      }
    }.toDF("geometry", "geom_type", "properties", "filename")
  }

  /** Parse one .map document into contour rows. */
  def parse(text: String): Seq[(Array[Byte], String, Map[String, String])] = {
    val lines = text.split("\r?\n", -1)
    require(lines.length > 4, "malformed WAsP .map: missing 4-line header")
    // everything after the header is one token stream; attribute lines
    // are recognized structurally (1-4 tokens would be ambiguous in a
    // flat stream, so parse line-wise for attributes, token-wise for
    // coordinates)
    val out = ArrayBuffer.empty[(Array[Byte], String, Map[String, String])]
    var i = 4
    def numbersOf(l: String): Array[Double] = {
      val t = l.trim
      if (t.isEmpty) Array.empty
      else t.split("\\s+").map { s =>
        try s.toDouble catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"malformed WAsP .map: non-numeric token '$s'")
        }
      }
    }
    while (i < lines.length) {
      val attrs = numbersOf(lines(i))
      i += 1
      if (attrs.nonEmpty) {
        require(attrs.length >= 2 && attrs.length <= 4,
          s"malformed WAsP .map: attribute line with ${attrs.length} numbers")
        val n = attrs.last.toInt
        require(n >= 2 && attrs.last == n.toDouble,
          s"malformed WAsP .map: vertex count ${attrs.last}")
        // consume 2n coordinate tokens across following lines
        val coords = ArrayBuffer.empty[Double]
        while (coords.length < 2 * n && i < lines.length) {
          coords ++= numbersOf(lines(i)); i += 1
        }
        require(coords.length == 2 * n,
          s"malformed WAsP .map: contour declares $n points but " +
            s"${coords.length / 2} present")
        val pts = (0 until n).map(k => Pt(coords(2 * k), coords(2 * k + 1)))
        val g = GLine(pts.toIndexedSeq)
        val props = attrs.dropRight(1) match {
          case Array(e) => Map("elev" -> e.toString)
          case Array(rl, rr) =>
            Map("rough_l" -> rl.toString, "rough_r" -> rr.toString)
          case Array(rl, rr, e) => Map("rough_l" -> rl.toString,
            "rough_r" -> rr.toString, "elev" -> e.toString)
          case _ => Map.empty[String, String]
        }
        out += ((toWkb(g), Geometry.geometryType(g), props))
      }
    }
    out.toSeq
  }
}
