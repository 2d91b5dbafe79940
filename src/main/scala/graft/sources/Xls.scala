package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16LE}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable.ArrayBuffer

/** Native legacy-Excel `.xls` scan — the last named row of the
  * reference's GDAL format table (docs/file-formats-reference.md:
  * 102-125). Both layers are publicly specified (MS-CFB compound file
  * binary + MS-XLS BIFF8), so like the XLSX/Shapefile readers this
  * parses from the spec with the JDK alone:
  *
  *   - CFB: 512-byte header (FAT via header DIFAT + DIFAT sector
  *     chains), directory stream walk, standard sector chains, and the
  *     mini-FAT/mini-stream for streams under the 4096-byte cutoff;
  *   - BIFF8 `Workbook` stream: the workbook-globals substream
  *     supplies BOUNDSHEET (tab name → substream offset) and SST
  *     (shared strings, incl. CONTINUE splits where the compression
  *     flag restates itself per fragment — the classic BIFF trap);
  *     each worksheet substream supplies cells via LABELSST / NUMBER /
  *     RK / MULRK / LABEL / BOOLERR / FORMULA(+STRING cached text).
  *
  * Output contract matches [[Xlsx]]: all values surface as strings
  * (numbers via the shortest round-trip `Double` rendering), first
  * worksheet by default, `layer` selects a tab by name, header row
  * opt-out. Same driver-side scale posture as XLSX — the format's own
  * 65,536-row sheet bound, stated not hidden.
  */
object Xls {

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
          Option(h).map(_.trim).filter(_.nonEmpty).getOrElse(s"c${i + 1}")
            .replaceAll("[^A-Za-z0-9_]", "_")
        }
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

  // -------------------------------------------------------------- cfb

  /** Extract a named stream from a compound file. */
  private[graft] def cfbStream(bytes: Array[Byte],
      names: Set[String]): Array[Byte] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 && bb.getLong(0) == 0xE11AB1A1E011CFD0L,
      "not a compound file (bad CFB magic)")
    val sectorShift = bb.getShort(30) & 0xffff
    val sectorSize = 1 << sectorShift
    val miniShift = bb.getShort(32) & 0xffff
    val miniSize = 1 << miniShift
    val numFat = bb.getInt(44)
    val dirStart = bb.getInt(48)
    val miniCutoff = bb.getInt(56)
    val miniFatStart = bb.getInt(60)
    val difatStart = bb.getInt(68)
    val numDifat = bb.getInt(72)
    // MS-CFB: sector N begins at (N+1)<<sectorShift — for major
    // version 3 (512-byte sectors) that is the familiar 512 + N*512,
    // and for version 4 (4096-byte sectors) sector 0 starts at 4096,
    // NOT at 512 (the header pads to a full sector)
    def sectorPos(s: Int): Int = (s + 1) << sectorShift

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    val fatSectors = ArrayBuffer.empty[Int]
    (0 until 109).foreach { i =>
      val v = bb.getInt(76 + 4 * i)
      if (v >= 0) fatSectors += v
    }
    var ds = difatStart
    var guard = 0
    while (ds >= 0 && guard <= numDifat) {
      val base = sectorPos(ds)
      (0 until sectorSize / 4 - 1).foreach { i =>
        val v = bb.getInt(base + 4 * i)
        if (v >= 0) fatSectors += v
      }
      ds = bb.getInt(base + sectorSize - 4)
      guard += 1
    }
    require(fatSectors.length >= numFat, "truncated DIFAT")
    def fat(s: Int): Int = {
      val perSector = sectorSize / 4
      val fs = fatSectors(s / perSector)
      bb.getInt(sectorPos(fs) + 4 * (s % perSector))
    }
    def chain(start: Int): Seq[Int] = {
      val out = ArrayBuffer.empty[Int]
      var s = start
      while (s >= 0) {
        out += s
        s = fat(s)
        require(out.length <= bytes.length / sectorSize + 2,
          "FAT chain loop")
      }
      out.toSeq
    }
    def readChain(start: Int, len: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start).foreach { s =>
        val p = sectorPos(s)
        out.write(bytes, p, math.min(sectorSize, bytes.length - p))
      }
      val a = out.toByteArray
      if (len >= 0 && len < a.length) java.util.Arrays.copyOf(a, len.toInt)
      else a
    }

    // directory entries: 128 bytes each, UTF-16LE names
    val dir = readChain(dirStart, -1)
    val dbb = ByteBuffer.wrap(dir).order(ByteOrder.LITTLE_ENDIAN)
    case class Entry(name: String, typ: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val base = 128 * i
      val nameLen = dbb.getShort(base + 64) & 0xffff
      val name = if (nameLen >= 2)
        new String(dir, base, nameLen - 2, UTF_16LE) else ""
      Entry(name, dir(base + 66) & 0xff, dbb.getInt(base + 116),
        dbb.getLong(base + 120))
    }
    val root = entries.find(_.typ == 5)
      .getOrElse(throw new IllegalArgumentException("CFB has no root entry"))
    val target = entries.find(e => e.typ == 2 && names.contains(e.name))
      .getOrElse(throw new IllegalArgumentException(
        s"no ${names.mkString("/")} stream in compound file " +
          s"(streams: ${entries.filter(_.typ == 2).map(_.name).mkString(", ")})"))

    if (target.size >= miniCutoff) readChain(target.start, target.size)
    else {
      // mini stream: sectors of miniSize inside the root entry's chain,
      // addressed by the mini FAT
      val miniStream = readChain(root.start, root.size)
      val miniFat = readChain(miniFatStart, -1)
      val mbb = ByteBuffer.wrap(miniFat).order(ByteOrder.LITTLE_ENDIAN)
      val out = new java.io.ByteArrayOutputStream()
      var s = target.start
      var guard = 0
      while (s >= 0) {
        val p = s * miniSize
        out.write(miniStream, p,
          math.min(miniSize, miniStream.length - p))
        s = mbb.getInt(4 * s)
        guard += 1
        require(guard <= miniFat.length / 4 + 2, "mini FAT chain loop")
      }
      java.util.Arrays.copyOf(out.toByteArray,
        math.min(target.size, Int.MaxValue).toInt)
    }
  }

  // ------------------------------------------------------------- biff

  private final case class Rec(typ: Int, pos: Int, len: Int)

  /** Parse .xls bytes into a row-major grid of nullable strings. */
  def parse(bytes: Array[Byte],
      layer: Option[String] = None): Vector[Vector[String]] = {
    val wb = cfbStream(bytes, Set("Workbook", "Book"))
    val bb = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    // record scan
    val recs = ArrayBuffer.empty[Rec]
    var p = 0
    while (p + 4 <= wb.length) {
      val t = bb.getShort(p) & 0xffff
      val l = bb.getShort(p + 2) & 0xffff
      recs += Rec(t, p + 4, l)
      p += 4 + l
    }
    require(recs.nonEmpty && recs.head.typ == 0x809,
      "Workbook stream does not start with BOF")
    require((bb.getShort(recs.head.pos) & 0xffff) == 0x600,
      "only BIFF8 .xls is supported (BIFF5 and earlier refuse)")

    // globals substream: everything up to the matching EOF of the
    // first BOF supplies BOUNDSHEETs + the SST
    case class Sheet(name: String, offset: Int)
    val sheets = ArrayBuffer.empty[Sheet]
    var sst: IndexedSeq[String] = Vector.empty
    var i = 1 // past the globals BOF
    var depth = 1
    while (i < recs.length && depth > 0) {
      val r = recs(i)
      if (r.typ == 0x809) depth += 1
      else if (r.typ == 0x0A) depth -= 1
      else if (depth == 1 && r.typ == 0x85) { // BOUNDSHEET
        val off = bb.getInt(r.pos)
        val nameLen = wb(r.pos + 6) & 0xff
        val grbit = wb(r.pos + 7) & 0xff
        val name =
          if ((grbit & 1) == 0)
            new String(wb, r.pos + 8, nameLen, ISO_8859_1)
          else new String(wb, r.pos + 8, nameLen * 2, UTF_16LE)
        sheets += Sheet(name, off)
      } else if (depth == 1 && r.typ == 0xFC) { // SST (+ CONTINUEs)
        val frags = ArrayBuffer[(Int, Int)]((r.pos, r.len))
        var j = i + 1
        while (j < recs.length && recs(j).typ == 0x3C) {
          frags += ((recs(j).pos, recs(j).len)); j += 1
        }
        sst = parseSst(wb, bb, frags.toSeq)
      }
      i += 1
    }

    require(sheets.nonEmpty, "workbook has no BOUNDSHEET records")
    val sheet = layer match {
      case Some(want) =>
        sheets.find(_.name == want).getOrElse(
          throw new IllegalArgumentException(
            s"no sheet named '$want' (sheets: " +
              s"${sheets.map(_.name).mkString(", ")})"))
      case None => sheets.head
    }

    // worksheet substream: cells between its BOF and matching EOF
    val cells = ArrayBuffer.empty[(Int, Int, String)] // (row, col, value)
    val startIdx = recs.indexWhere(_.pos - 4 == sheet.offset)
    require(startIdx >= 0 && recs(startIdx).typ == 0x809,
      s"sheet '${sheet.name}' offset does not land on a BOF record")
    var k = startIdx + 1
    var open = 1
    while (k < recs.length && open > 0) {
      val r = recs(k)
      r.typ match {
        case 0x809 => open += 1
        case 0x0A => open -= 1
        case 0xFD => // LABELSST: rw, col, ixfe, isst
          val idx = bb.getInt(r.pos + 6)
          if (idx >= 0 && idx < sst.length)
            cells += ((bb.getShort(r.pos) & 0xffff,
              bb.getShort(r.pos + 2) & 0xffff, sst(idx)))
        case 0x203 => // NUMBER
          cells += ((bb.getShort(r.pos) & 0xffff,
            bb.getShort(r.pos + 2) & 0xffff,
            renderNum(bb.getDouble(r.pos + 6))))
        case 0x27E => // RK
          cells += ((bb.getShort(r.pos) & 0xffff,
            bb.getShort(r.pos + 2) & 0xffff,
            renderNum(rkValue(bb.getInt(r.pos + 6)))))
        case 0xBD => // MULRK: rw, colFirst, (ixfe, rk)*, colLast
          val rw = bb.getShort(r.pos) & 0xffff
          val c0 = bb.getShort(r.pos + 2) & 0xffff
          val n = (r.len - 6) / 6
          (0 until n).foreach { m =>
            cells += ((rw, c0 + m,
              renderNum(rkValue(bb.getInt(r.pos + 4 + 6 * m + 2)))))
          }
        case 0x204 => // LABEL: inline BIFF8 unicode string
          val rw = bb.getShort(r.pos) & 0xffff
          val c = bb.getShort(r.pos + 2) & 0xffff
          val cch = bb.getShort(r.pos + 6) & 0xffff
          val grbit = wb(r.pos + 8) & 0xff
          val s = if ((grbit & 1) == 0)
            new String(wb, r.pos + 9, cch, ISO_8859_1)
          else new String(wb, r.pos + 9, cch * 2, UTF_16LE)
          cells += ((rw, c, s))
        case 0x205 => // BOOLERR
          val isErr = wb(r.pos + 7) != 0
          if (!isErr)
            cells += ((bb.getShort(r.pos) & 0xffff,
              bb.getShort(r.pos + 2) & 0xffff,
              if (wb(r.pos + 6) != 0) "true" else "false"))
        case 0x06 => // FORMULA: cached number result, or string marker
          val rw = bb.getShort(r.pos) & 0xffff
          val c = bb.getShort(r.pos + 2) & 0xffff
          val hi = bb.getShort(r.pos + 12) & 0xffff
          if (hi == 0xFFFF) {
            // non-numeric cached result: 0 = string (STRING record
            // follows), 1 = bool, 2 = error
            (wb(r.pos + 6) & 0xff) match {
              case 0 =>
                val next = recs.drop(k + 1)
                  .find(x => x.typ != 0x3C && x.typ != 0x221)
                next.filter(_.typ == 0x207).foreach { sr =>
                  val cch = bb.getShort(sr.pos) & 0xffff
                  val grbit = wb(sr.pos + 2) & 0xff
                  val s = if ((grbit & 1) == 0)
                    new String(wb, sr.pos + 3, cch, ISO_8859_1)
                  else new String(wb, sr.pos + 3, cch * 2, UTF_16LE)
                  cells += ((rw, c, s))
                }
              case 1 => cells += ((rw, c,
                if (wb(r.pos + 8) != 0) "true" else "false"))
              case _ => // error cell: stays null
            }
          } else cells += ((rw, c, renderNum(bb.getDouble(r.pos + 6))))
        case _ => // BLANK/MULBLANK/formatting: no value
      }
      k += 1
    }

    // grid assembly
    if (cells.isEmpty) return Vector.empty
    val maxRow = cells.map(_._1).max
    val grid = Array.fill(maxRow + 1)(ArrayBuffer.empty[(Int, String)])
    cells.foreach { case (rw, c, v) => grid(rw) += ((c, v)) }
    grid.toVector.map { rowCells =>
      if (rowCells.isEmpty) Vector.empty[String]
      else {
        val w = rowCells.map(_._1).max + 1
        val arr = Array.fill[String](w)(null)
        rowCells.foreach { case (c, v) => arr(c) = v }
        arr.toVector
      }
    }
  }

  /** RK number: 30-bit value, bit0 = ÷100, bit1 = integer. */
  private[graft] def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** Integral doubles render without the trailing `.0` (the textual
    * contract: an .xls `3` should read as "3", like CSV).
    */
  private def renderNum(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString
    else d.toString

  /** SST across its CONTINUE fragments. The BIFF trap: a string may
    * split mid-way, and each fragment restates the compression flag
    * for ITS portion.
    */
  private def parseSst(wb: Array[Byte], bb: ByteBuffer,
      frags: Seq[(Int, Int)]): IndexedSeq[String] = {
    // fragment-aware cursor
    var fi = 0
    var p = frags.head._1 + 8 // skip cstTotal/cstUnique
    def fragEnd: Int = frags(fi)._1 + frags(fi)._2
    def atEnd: Boolean = fi == frags.length - 1 && p >= fragEnd
    def hop(): Unit = {
      while (fi < frags.length - 1 && p >= fragEnd) {
        fi += 1; p = frags(fi)._1
      }
    }
    def u8(): Int = { hop(); val v = wb(p) & 0xff; p += 1; v }
    def u16(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
    def u32(): Long = { val a = u16().toLong; val b = u16().toLong
      a | (b << 16) }
    val total = bb.getInt(frags.head._1 + 4)
    val out = Vector.newBuilder[String]
    var n = 0
    while (n < total && !atEnd) {
      val cch = u16()
      var grbit = u8()
      val cRun = if ((grbit & 8) != 0) u16() else 0
      val cbExt = if ((grbit & 4) != 0) u32() else 0L
      val sb = new StringBuilder
      var got = 0
      while (got < cch) {
        if (p >= fragEnd) {
          // fragment boundary inside character data: the next
          // fragment's FIRST byte restates the compression flag for
          // its portion (the classic BIFF8 CONTINUE rule)
          require(fi < frags.length - 1, "SST truncated mid-string")
          fi += 1; p = frags(fi)._1
          grbit = (grbit & ~1) | (wb(p) & 1)
          p += 1
        }
        val charSize = if ((grbit & 1) == 0) 1 else 2
        val avail = (fragEnd - p) / charSize
        val take = math.min(cch - got, avail)
        if (take <= 0) p = fragEnd // odd tail: force a crossing
        else {
          if (charSize == 1) sb.append(new String(wb, p, take, ISO_8859_1))
          else sb.append(new String(wb, p, take * 2, UTF_16LE))
          p += take * charSize
          got += take
        }
      }
      // skip rich runs / extended data (may themselves span fragments)
      var skip = cRun * 4 + cbExt
      while (skip > 0) { u8(); skip -= 1 }
      out += sb.toString
      n += 1
    }
    out.result()
  }
}
