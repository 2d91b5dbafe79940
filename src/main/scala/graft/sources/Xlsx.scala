package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element
import scala.collection.mutable.ArrayBuffer

/** Native XLSX scan (SURVEY.md §2.1 "GDAL/geo scan" tail,
  * docs/file-formats-reference.md:96-140 lists XLSX among the GDAL
  * formats). An .xlsx file is a ZIP of ECMA-376 SpreadsheetML XML
  * parts — both readable with the JDK alone (java.util.zip +
  * javax.xml.parsers), so like the shapefile reader this comes
  * straight from the public spec, no GDAL/POI:
  *
  *   - one worksheet becomes the table: the first tab in workbook
  *     order by default, or the tab named by `layer` (the reference's
  *     `layer 'Sheet 1'` option, docs/file-formats-reference.md:128);
  *   - cell types: shared strings (`t="s"` via xl/sharedStrings.xml),
  *     inline strings (`t="inlineStr"`), formula-cached strings
  *     (`t="str"`), booleans (`t="b"`), and plain numbers;
  *   - the first row supplies column names (opt-out via
  *     `header = false` → c1..cn); all values stay strings, the same
  *     textual contract as the CSV layer before casts.
  *
  * Scale posture: spreadsheets are bounded by Excel's own 1,048,576-row
  * sheet limit, so this parses driver-side and parallelizes the rows —
  * a deliberate non-goal for distribution, stated here rather than
  * hidden (same stance GDAL takes: XLSX is not a big-data format).
  */
object Xlsx {

  def read(spark: SparkSession, path: String,
      header: Boolean = true, layer: Option[String] = None): DataFrame = {
    val bytes = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try in.readAllBytes() finally in.close()
    }
    val grid = parse(bytes, layer)
    require(grid.nonEmpty, s"empty worksheet in $path")
    val width = grid.map(_.length).max
    val padded = grid.map(r => r.padTo(width, null: String))
    val (names, rows) =
      if (header) {
        val hs = padded.head.zipWithIndex.map { case (h, i) =>
          val base = Option(h).map(_.trim).filter(_.nonEmpty)
            .getOrElse(s"c${i + 1}")
          base.replaceAll("[^A-Za-z0-9_]", "_")
        }
        // dedupe repeated header names positionally
        val seen = scala.collection.mutable.Map.empty[String, Int]
        val uniq = hs.map { h =>
          val n = seen.getOrElse(h, 0); seen(h) = n + 1
          if (n == 0) h else s"${h}_$n"
        }
        (uniq, padded.tail)
      } else ((1 to width).map(i => s"c$i").toVector, padded)
    val schema = StructType(names.map(n =>
      StructField(n, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq),
        math.max(1, math.min(rows.length, 8))),
      schema)
  }

  /** Parse .xlsx bytes into a row-major grid of nullable strings.
    * `layer` selects a worksheet by its workbook tab name (the
    * reference's `layer 'Sheet 1'` option); default is the FIRST tab in
    * workbook order — resolved through xl/workbook.xml and its
    * relationships, because part names don't track tab order
    * (sheet10.xml sorts before sheet2.xml, and parts can be renamed
    * arbitrarily).
    */
  def parse(bytes: Array[Byte],
      layer: Option[String] = None): Vector[Vector[String]] = {
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      val n = e.getName
      if (n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
          n == "xl/sharedStrings.xml" ||
          n.matches("xl/worksheets/[^/]+\\.xml"))
        parts(n) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    val sheet = resolveSheet(parts, layer)
    val sharedStrings: IndexedSeq[String] =
      parts.get("xl/sharedStrings.xml") match {
        case None => Vector.empty
        case Some(shared) => elements(dom(shared), "si").map(richText)
      }
    val rows = ArrayBuffer.empty[Vector[String]]
    elements(dom(sheet), "row").foreach { r =>
      val cells = ArrayBuffer.empty[(Int, String)]
      elements(r, "c").foreach { c =>
        val col = colIndex(c.getAttribute("r"), cells.length)
        val t = c.getAttribute("t")
        val v = t match {
          case "inlineStr" =>
            childElements(c).find(_.getTagName == "is")
              .map(richText).getOrElse("")
          case "s" =>
            val idx = elements(c, "v").headOption
              .map(_.getTextContent.trim.toInt).getOrElse(-1)
            if (idx >= 0 && idx < sharedStrings.length) sharedStrings(idx)
            else null
          case "b" =>
            elements(c, "v").headOption.map(_.getTextContent.trim)
              .map(x => if (x == "1") "true" else "false").orNull
          case _ => // "str", "n", "" — the cached/raw <v> text
            elements(c, "v").headOption.map(_.getTextContent).orNull
        }
        cells += ((col, v))
      }
      val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
      val arr = Array.fill[String](width)(null)
      cells.foreach { case (i, v) => arr(i) = v }
      rows += arr.toVector
    }
    rows.toVector
  }

  /** Pick the worksheet part: by tab name when `layer` is given, else
    * the first tab in workbook order. Falls back to numeric-suffix
    * ordering of sheetN.xml parts when xl/workbook.xml is absent.
    */
  private def resolveSheet(parts: collection.Map[String, Array[Byte]],
      layer: Option[String]): Array[Byte] = {
    val sheetParts = parts.keys
      .filter(_.matches("xl/worksheets/[^/]+\\.xml")).toVector
    require(sheetParts.nonEmpty, "xlsx has no xl/worksheets/*.xml part")
    val byWorkbook: Option[Array[Byte]] = for {
      wb <- parts.get("xl/workbook.xml")
      rels <- parts.get("xl/_rels/workbook.xml.rels")
      // rId -> part path ("worksheets/sheet1.xml", possibly "/xl/…")
      relMap = elements(dom(rels), "Relationship").map { r =>
        val target = r.getAttribute("Target")
        r.getAttribute("Id") ->
          (if (target.startsWith("/")) target.stripPrefix("/")
           else "xl/" + target)
      }.toMap
      tabs = elements(dom(wb), "sheet").map { s =>
        // namespace-unaware parse: the relationship attr is literally
        // "r:id" (ECMA-376 names the prefix in the workbook part)
        s.getAttribute("name") -> s.getAttribute("r:id")
      }
      chosen <- layer match {
        case Some(want) =>
          val hit = tabs.find(_._1 == want)
          require(hit.isDefined,
            s"no sheet named '$want' (sheets: ${tabs.map(_._1).mkString(", ")})")
          hit
        case None => tabs.headOption
      }
      bytes <- relMap.get(chosen._2).flatMap(parts.get)
    } yield bytes
    byWorkbook.getOrElse {
      require(layer.isEmpty,
        s"cannot resolve sheet '${layer.get}': xlsx has no xl/workbook.xml")
      // no workbook part: numeric suffix order, not lexicographic
      // (sheet2 before sheet10)
      parts(sheetParts.sortBy { p =>
        "([0-9]+)\\.xml$".r.findFirstMatchIn(p)
          .map(_.group(1).toLong).getOrElse(Long.MaxValue)
      }.head)
    }
  }

  /** Rich text of an <si>/<is> container: its direct <t> child plus the
    * <t> of each <r> run — excluding <rPh>/<phoneticPr> subtrees, whose
    * <t> descendants are phonetic hints, not cell text.
    */
  private def richText(container: Element): String = {
    val sb = new StringBuilder
    childElements(container).foreach {
      case t if t.getTagName == "t" => sb.append(t.getTextContent)
      case r if r.getTagName == "r" =>
        childElements(r).filter(_.getTagName == "t")
          .foreach(t => sb.append(t.getTextContent))
      case _ => // rPh, phoneticPr, rPr — not cell text
    }
    sb.toString
  }

  /** Direct child elements only (no descendants). */
  private def childElements(root: Element): Vector[Element] = {
    val nl = root.getChildNodes
    (0 until nl.getLength).flatMap(nl.item(_) match {
      case e: Element => Some(e)
      case _ => None
    }).toVector
  }

  private def dom(xml: Array[Byte]): Element = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // spreadsheet parts are data, not documents: no external entities
    f.setFeature(
      "http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml)).getDocumentElement
  }

  /** All descendant elements with the given local tag name. */
  private def elements(root: Element, tag: String): Vector[Element] = {
    val nl = root.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element]).toVector
  }

  /** "BC12" -> 54; empty/absent cell refs fall back to position. */
  private def colIndex(ref: String, fallback: Int): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) fallback
    else letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
  }
}
