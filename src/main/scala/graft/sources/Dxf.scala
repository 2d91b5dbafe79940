package graft.sources

import graft.functions.Geometry
import graft.functions.Geometry._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** AutoCAD DXF scan — the `.dxf` row of the reference's GDAL format
  * table (docs/file-formats-reference.md:102-125). ASCII DXF is
  * publicly specified (Autodesk DXF Reference: the file is a flat
  * stream of (group-code line, value line) pairs), so like the other
  * geo readers this parses from the spec with the JDK alone; binary
  * `.dwg` is proprietary and refuses loudly.
  *
  * Entity coverage (the GDAL vector mapping for 2-D work):
  *   - `POINT`                  → POINT (10/20)
  *   - `LINE`                   → LINESTRING (10/20 → 11/21)
  *   - `LWPOLYLINE`             → LINESTRING, or POLYGON when the
  *     closed flag (70 bit 1) is set (the ring is closed implicitly)
  *   - `POLYLINE`+`VERTEX`…`SEQEND` (legacy) → same mapping
  *   - other entity types (CIRCLE/ARC/TEXT/INSERT/3DFACE…) are
  *     SKIPPED — they model curves/annotation, not the vector rows a
  *     query layer exposes; skipping is per-entity and never silently
  *     truncates a supported one.
  *
  * Each row carries `properties['layer']` (group 8) and, when present,
  * the entity handle (group 5) — output contract identical to
  * [[GeoJson]]: `(geometry wkb, geom_type, properties, filename)`.
  *
  * Scale shape: one task per FILE (a DXF document is not
  * line-splittable — VERTEX runs span lines), parsed in executors via
  * flatMap; a directory of files parallelizes like any file source.
  */
object Dxf {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("filename"),
        col("value"))
      .as[(String, String)]
    raw.flatMap { case (file, text) =>
      parseEntities(text).map { case (wkb, gtype, props) =>
        (wkb, gtype, props, file)
      }
    }.toDF("geometry", "geom_type", "properties", "filename")
  }

  /** Parse one ASCII DXF document's ENTITIES section. */
  def parseEntities(text: String):
      Seq[(Array[Byte], String, Map[String, String])] = {
    require(!text.startsWith("AutoCAD Binary DXF"),
      "binary DXF (and .dwg) are not supported - convert to ASCII DXF")
    // (code, value) pair stream; group-code lines are integers,
    // historically space-padded
    val lines = text.split("\r?\n", -1)
    val pairs = ArrayBuffer.empty[(Int, String)]
    var i = 0
    while (i + 1 < lines.length) {
      val codeStr = lines(i).trim
      if (codeStr.nonEmpty) {
        val code = try codeStr.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"malformed DXF: group-code line '$codeStr' is not an integer")
        }
        pairs += ((code, lines(i + 1).trim))
        i += 2
      } else i += 1
    }

    // locate the ENTITIES section
    var start = -1
    var j = 0
    while (j < pairs.length - 1 && start < 0) {
      if (pairs(j) == ((0, "SECTION")) && pairs(j + 1) == ((2, "ENTITIES")))
        start = j + 2
      j += 1
    }
    if (start < 0) return Nil // no entities section: zero rows

    val out = ArrayBuffer.empty[(Array[Byte], String, Map[String, String])]
    var k = start
    // per-entity state, filled by the scan below
    while (k < pairs.length && pairs(k) != ((0, "ENDSEC"))) {
      val (code, value) = pairs(k)
      if (code == 0) {
        value match {
          case "POINT" | "LINE" | "LWPOLYLINE" =>
            val (entity, next) = collectEntity(pairs, k + 1)
            emitSimple(value, entity, out)
            k = next
          case "POLYLINE" =>
            // legacy: header entity, VERTEX entities, SEQEND
            val (header, afterHeader) = collectEntity(pairs, k + 1)
            val verts = ArrayBuffer.empty[Pt]
            var m = afterHeader
            var done = false
            while (m < pairs.length && !done) {
              pairs(m) match {
                case (0, "VERTEX") =>
                  val (v, n2) = collectEntity(pairs, m + 1)
                  verts += Pt(coord(v, 10), coord(v, 20))
                  m = n2
                case (0, "SEQEND") =>
                  val (_, n2) = collectEntity(pairs, m + 1)
                  m = n2; done = true
                case (0, other) => throw new IllegalArgumentException(
                  s"malformed DXF: POLYLINE run interrupted by '$other' " +
                    "before SEQEND")
                case _ => m += 1
              }
            }
            if (!done) throw new IllegalArgumentException(
              "malformed DXF: POLYLINE without SEQEND")
            val closed = (header.collect { case (70, v) => v.toInt }
              .headOption.getOrElse(0) & 1) != 0
            emitPoly(verts.toIndexedSeq, closed, header, out)
            k = m
          case _ =>
            // unsupported entity type: skip its pairs
            val (_, next) = collectEntity(pairs, k + 1)
            k = next
        }
      } else k += 1
    }
    out.toSeq
  }

  /** Collect one entity's (code, value) pairs up to the next group 0. */
  private def collectEntity(pairs: ArrayBuffer[(Int, String)],
      from: Int): (Seq[(Int, String)], Int) = {
    var k = from
    val ent = ArrayBuffer.empty[(Int, String)]
    while (k < pairs.length && pairs(k)._1 != 0) {
      ent += pairs(k); k += 1
    }
    (ent.toSeq, k)
  }

  private def coord(ent: Seq[(Int, String)], code: Int): Double =
    ent.collectFirst { case (`code`, v) => v.toDouble }.getOrElse(
      throw new IllegalArgumentException(
        s"malformed DXF: entity missing group $code"))

  private def propsOf(ent: Seq[(Int, String)]): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    ent.collectFirst { case (8, v) => v }.foreach(m += "layer" -> _)
    ent.collectFirst { case (5, v) => v }.foreach(m += "handle" -> _)
    m.result()
  }

  private def emitSimple(typ: String, ent: Seq[(Int, String)],
      out: ArrayBuffer[(Array[Byte], String, Map[String, String])]): Unit =
    typ match {
      case "POINT" =>
        val g = GPoint(Some(Pt(coord(ent, 10), coord(ent, 20))))
        out += ((toWkb(g), Geometry.geometryType(g), propsOf(ent)))
      case "LINE" =>
        val g = GLine(IndexedSeq(Pt(coord(ent, 10), coord(ent, 20)),
          Pt(coord(ent, 11), coord(ent, 21))))
        out += ((toWkb(g), Geometry.geometryType(g), propsOf(ent)))
      case "LWPOLYLINE" =>
        // vertices are the sequential (10, 20) pairs; 70 bit 1 = closed
        val xs = ent.collect { case (10, v) => v.toDouble }
        val ys = ent.collect { case (20, v) => v.toDouble }
        require(xs.length == ys.length && xs.nonEmpty,
          s"malformed DXF: LWPOLYLINE with ${xs.length} x / ${ys.length} y")
        val declared = ent.collectFirst { case (90, v) => v.toInt }
        declared.foreach(n => require(n == xs.length,
          s"malformed DXF: LWPOLYLINE declares $n vertices, " +
            s"${xs.length} present"))
        val closed = (ent.collectFirst { case (70, v) => v.toInt }
          .getOrElse(0) & 1) != 0
        emitPoly(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toIndexedSeq,
          closed, ent, out)
    }

  private def emitPoly(pts: IndexedSeq[Pt], closed: Boolean,
      ent: Seq[(Int, String)],
      out: ArrayBuffer[(Array[Byte], String, Map[String, String])]): Unit = {
    val g: Geom =
      if (closed) {
        require(pts.length >= 3,
          s"malformed DXF: closed polyline with ${pts.length} vertices")
        GPolygon(IndexedSeq(
          if (pts.head == pts.last) pts else pts :+ pts.head))
      } else {
        require(pts.length >= 2,
          s"malformed DXF: open polyline with ${pts.length} vertices")
        GLine(pts)
      }
    out += ((toWkb(g), Geometry.geometryType(g), propsOf(ent)))
  }
}
