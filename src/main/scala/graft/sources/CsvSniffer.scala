package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** CSV dialect detection (SURVEY §2.1; the reference auto-detects
  * header/delimiter/quote via its engine's CSV sniffer —
  * docs/file-formats-reference.md:51, options normalized in
  * pg_lake_engine/src/csv/csv_options.c). Spark's CSV reader does not
  * sniff, so this implements the classic consistency heuristic over a
  * bounded sample: the winning delimiter yields the most columns with a
  * consistent count across sample lines; quote is whichever quote char
  * actually wraps fields; header is declared when the first row looks
  * textual while data rows are typed. Only the SAMPLE is read — a
  * driver-side bounded I/O, never a data scan.
  */
object CsvSniffer {

  final case class Dialect(delimiter: String, quote: String, escape: String,
      header: Boolean)

  private val CandidateDelims = Seq(',', '\t', ';', '|')

  /** Split one line by `delim` honoring `quote` (doubled-quote escape —
    * the PG/RFC4180 convention the reference writes,
    * csv_writer.c).
    */
  private[sources] def splitLine(line: String, delim: Char,
      quote: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuote) {
        if (c == quote && i + 1 < line.length && line.charAt(i + 1) == quote) {
          cur.append(quote); i += 1
        } else if (c == quote) inQuote = false
        else cur.append(c)
      } else {
        if (c == quote && cur.isEmpty) inQuote = true
        else if (c == delim) { out += cur.result(); cur.clear() }
        else cur.append(c)
      }
      i += 1
    }
    out += cur.result()
    out.toSeq
  }

  /** First ~`maxLines` text lines of the first file matching `path`
    * (directories/globs pick the lexicographically first data file;
    * .gz transparently decompressed).
    */
  private def sampleLines(path: String, conf: Configuration,
      maxLines: Int = 64): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def isData(st: org.apache.hadoop.fs.FileStatus): Boolean = {
      val n = st.getPath.getName
      st.isFile && st.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
    }
    val file: Path = {
      val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
      val first = matched.sortBy(_.getPath.toString).collectFirst {
        case st if isData(st) => st.getPath
        case st if st.isDirectory =>
          fs.listStatus(st.getPath).filter(isData)
            .sortBy(_.getPath.toString).head.getPath
      }
      first.getOrElse(throw new IllegalArgumentException(s"no file at $path"))
    }
    val raw = fs.open(file)
    val in = if (file.getName.endsWith(".gz")) new GZIPInputStream(raw) else raw
    val rdr = new BufferedReader(
      new InputStreamReader(in, StandardCharsets.UTF_8))
    try Iterator.continually(rdr.readLine()).takeWhile(_ != null)
      .take(maxLines).toList.filter(_.nonEmpty)
    finally rdr.close()
  }

  private def looksNumeric(s: String): Boolean =
    s.nonEmpty && s.matches("[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?")

  /** Detect (delimiter, quote, escape, header) from a bounded sample. */
  def sniff(path: String, conf: Configuration): Dialect = {
    val lines = sampleLines(path, conf)
    if (lines.isEmpty) return Dialect(",", "\"", "\"", header = true)

    // (delimiter, quote) scored jointly: the winning pair yields the
    // most columns with a CONSISTENT count across the sample — a field
    // containing the delimiter only parses consistently under the quote
    // char that actually wraps it. Ties break toward the earlier
    // candidate (comma + double quote, the PG defaults).
    val pairs = for (d <- CandidateDelims; q <- Seq('"', '\'')) yield (d, q)
    val scored = pairs.map { case (d, q) =>
      val counts = lines.map(l => splitLine(l, d, q).size)
      val consistent = counts.distinct.size == 1 && counts.head > 1
      ((d, q), if (consistent) counts.head else 1)
    }
    val (delim, quoteCand) = scored.maxBy(_._2)._1
    // prefer the default double quote unless the winning parse actually
    // needed the other char (same score with '"' → keep '"')
    val bestScore = scored.maxBy(_._2)._2
    val quote =
      if (scored.exists { case ((d, q), s) =>
        d == delim && q == '"' && s == bestScore }) '"'
      else quoteCand

    // header: first row has no numeric-looking field in a position where
    // some data row does
    val firstFields = splitLine(lines.head, delim, quote)
    val dataRows = lines.tail.map(splitLine(_, delim, quote))
    val header = dataRows.nonEmpty && firstFields.zipWithIndex.exists {
      case (h, i) =>
        !looksNumeric(h) && dataRows.exists(r =>
          i < r.size && looksNumeric(r(i)))
    }
    // escape = quote: the doubled-quote convention both PG COPY and the
    // reference writer emit
    Dialect(delim.toString, quote.toString, quote.toString, header)
  }
}
