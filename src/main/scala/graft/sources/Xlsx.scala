package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Minimal XLSX ingest — pure JDK (java.util.zip + StAX), no POI.
  *
  * The reference's curator inputs are occasionally Excel exports
  * `[PK, SURVEY §0.1]`; this was the one uncovered input format through
  * round 9 (SURVEY §2a marked it out of scope for lack of a POI jar).
  * An .xlsx is just a zip of small XML parts, and the subset a curator
  * export actually uses — one sheet, shared/inline strings, numeric
  * cells, possibly-sparse rows — parses in ~100 lines of JDK-only code,
  * so the format is in scope after all.
  *
  * Scale shape: spreadsheets are a MANY-SMALL-FILES source (one workbook
  * per curator submission), never a splittable big file — so the engine
  * reads them with the binaryFile source (file-parallel, each workbook a
  * task) and parses per-partition on executors. The driver never touches
  * file bytes; a million workbooks fan out across the cluster exactly
  * like the src_dir_manifest tree walk.
  *
  * Parser scope (documented contract, pinned by XlsxSpec):
  *  - sheet1 only (first worksheet part by name), values as raw strings;
  *  - cell types: shared strings (t="s"), inline (t="inlineStr"),
  *    formula-string (t="str"), numeric/default (<v> verbatim);
  *  - sparse rows: the r="BC23" cell reference places values at their
  *    true column index, missing cells stay null;
  *  - XXE-hardened: DTDs and external entities disabled. */
object Xlsx {

  /** A1-style reference → 0-based column index ("A"→0, "AA"→26). */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Writer marker: emit this raw 1900-system serial as a date-styled
    * numeric cell (fixture probes for the leap-bug serials 59/60/61 —
    * a LocalDate can never produce the phantom serial 60). */
  case class DateSerial(n: Long)

  /** Excel 1900-system serial → ISO date string. Serial 1 = 1900-01-01;
    * the system inherits Lotus 1-2-3's phantom 1900-02-29 (serial 60, a
    * day that never existed — 1900 was no leap year), so serials ≥ 61
    * sit one ahead of the real calendar: 61 = 1900-03-01. Pinned
    * convention for the phantom itself: serial 60 clamps DOWN to
    * 1900-02-28 (the last real day before the gap), matching how
    * LibreOffice round-trips the cell. Fractional serials (datetimes)
    * truncate to their day. */
  private[sources] def serialToIso(d: Double): String = {
    val n = math.floor(d).toLong
    val epochDay =
      if (n >= 61) n - 25569L                   // post-gap: 25569 = serial(1970-01-01)
      else if (n == 60) -25509L                 // phantom 1900-02-29 → 1900-02-28
      else n - 25568L                           // pre-gap: serial 1 = 1900-01-01
    java.time.LocalDate.ofEpochDay(epochDay).toString
  }

  /** LocalDate → 1900-system serial (inverse of [[serialToIso]] away
    * from the phantom). */
  private[sources] def dateToSerial(d: java.time.LocalDate): Long =
    if (d.isBefore(java.time.LocalDate.of(1900, 3, 1))) d.toEpochDay + 25568L
    else d.toEpochDay + 25569L

  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Shared-strings table: one entry per <si>, concatenating every <t>
    * under it (plain and rich-text-run strings both flatten to text). */
  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(xml))
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t"  => inT = true
            case _    =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t"  => inT = false
            case "si" => out += cur.toString; cur = null
            case _    =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** xl/styles.xml → the set of cellXfs style INDEXES that render as
    * dates. An xf is a date style when its numFmtId is one of the
    * builtin date ids (14–22 locale dates, 27–36 East-Asian dates,
    * 45–47 and 50–58 date/time variants) or points at a custom numFmt
    * whose format code — with quoted literals and [bracketed] modifiers
    * stripped — still contains a day/year code (y/d; bare 'm' alone is
    * ambiguous with minutes and does not qualify). */
  private[sources] def parseStyles(xml: Array[Byte]): Set[Int] = {
    val builtinDate = ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet
    val customDate = scala.collection.mutable.Set.empty[Int]
    val xfFmts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(xml))
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(-1)
              val code = Option(r.getAttributeValue(null, "formatCode")).getOrElse("")
              val stripped = code.replaceAll("\"[^\"]*\"", "")
                                 .replaceAll("\\[[^\\]]*\\]", "")
              if (id >= 0 && stripped.exists(c => c == 'y' || c == 'Y' ||
                                                  c == 'd' || c == 'D'))
                customDate += id
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmts += Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    r.close()
    xfFmts.zipWithIndex.collect {
      case (fmt, i) if builtinDate(fmt) || customDate(fmt) => i
    }.toSet
  }

  /** xl/workbook.xml + its rels → worksheet parts in WORKBOOK ORDER:
    * (sheet name, zip entry name). The sheet1.xml-by-name shortcut the
    * single-sheet path takes is wrong in general — Excel numbers the
    * parts by creation order, not display order, and a reordered or
    * renamed workbook breaks it; the r:id → Target indirection is the
    * spec'd route. */
  private[sources] def parseWorkbookSheets(
      wbXml: Array[Byte], relsXml: Array[Byte]): Seq[(String, String)] = {
    val targets = scala.collection.mutable.Map.empty[String, String]
    val r1 = newFactory().createXMLStreamReader(new ByteArrayInputStream(relsXml))
    while (r1.hasNext) {
      if (r1.next() == XMLStreamConstants.START_ELEMENT &&
          r1.getLocalName == "Relationship") {
        val id = r1.getAttributeValue(null, "Id")
        val t = r1.getAttributeValue(null, "Target")
        if (id != null && t != null)
          targets(id) = if (t.startsWith("/")) t.drop(1) else s"xl/$t"
      }
    }
    r1.close()
    val sheets = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val r2 = newFactory().createXMLStreamReader(new ByteArrayInputStream(wbXml))
    while (r2.hasNext) {
      if (r2.next() == XMLStreamConstants.START_ELEMENT &&
          r2.getLocalName == "sheet") {
        val name = Option(r2.getAttributeValue(null, "name")).getOrElse("")
        // r:id is namespaced; StAX getAttributeValue(null, _) matches by
        // local name only with a null namespace — scan attributes by
        // local name to be namespace-robust.
        val rid = (0 until r2.getAttributeCount)
          .find(i => r2.getAttributeLocalName(i) == "id")
          .map(r2.getAttributeValue)
        rid.flatMap(targets.get).foreach(part => sheets += name -> part)
      }
    }
    r2.close()
    sheets.toSeq
  }

  /** One worksheet part → rows of cell strings (null = absent cell). */
  private def parseSheet(xml: Array[Byte],
                         shared: IndexedSeq[String]): Seq[Array[String]] =
    parseSheet(xml, shared, Set.empty)

  /** As above, with date decoding: a numeric cell whose style index is
    * in `dateStyles` surfaces as an ISO yyyy-MM-dd string instead of the
    * raw 1900-system serial. */
  private def parseSheet(xml: Array[Byte], shared: IndexedSeq[String],
                         dateStyles: Set[Int]): Seq[Array[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(xml))
    var cellCol = -1
    var cellType = ""
    var cellStyle = -1
    // Accumulated per CELL, not per <v>/<t>: an inline rich-text cell
    // (<is><r><t>a</t></r><r><t>b</t></r></is> — Excel emits these when
    // part of a cell is formatted) carries SEVERAL <t> runs that must
    // concatenate, exactly as parseSharedStrings concatenates runs
    // inside an <si>. The pre-r10 per-run emission kept only the last
    // run (last-wins on the same column index).
    var cellText: StringBuilder = null
    var sawValue = false
    var text: StringBuilder = null
    var collecting = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            // cellCol resets per ROW: r-less cells are consecutive from
            // column 0 of their own row (pre-r10 they continued from the
            // previous row's last column).
            case "row" => cells.clear(); cellCol = -1
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              // no r attribute → cells are simply consecutive
              cellCol = ref.map(colIndex).getOrElse(cellCol + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .flatMap(_.toIntOption).getOrElse(-1)
              cellText = new StringBuilder
              sawValue = false
            case "v" | "t" => collecting = true; text = new StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if collecting =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" =>
              collecting = false
              val raw = text.toString
              cellText.append(if (cellType == "s") shared(raw.toInt) else raw)
              sawValue = true
            case "c" =>
              if (sawValue) {
                val v0 = cellText.toString
                // date decode: numeric (default or explicit t="n") cell
                // with a date-rendering style → ISO string; anything
                // unparseable passes through verbatim.
                val v = if ((cellType == "" || cellType == "n") &&
                            dateStyles.contains(cellStyle))
                  v0.toDoubleOption.map(serialToIso).getOrElse(v0)
                else v0
                cells += cellCol -> v
              }
            case "row" =>
              if (cells.nonEmpty) {
                val width = cells.map(_._1).max + 1
                val arr = new Array[String](width)
                cells.foreach { case (i, v) => arr(i) = v }
                rows += arr
              } else rows += Array.empty[String]
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** Parse one workbook's bytes → sheet1 rows. Executor-side only. */
  private[sources] def parse(bytes: Array[Byte]): Seq[Array[String]] = {
    var shared: Array[Byte] = null
    var sheet: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/sharedStrings.xml") shared = zin.readAllBytes()
        else if (e.getName == "xl/worksheets/sheet1.xml") sheet = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheet != null, "no xl/worksheets/sheet1.xml part — not an xlsx?")
    val sst: IndexedSeq[String] =
      if (shared == null) IndexedSeq.empty else parseSharedStrings(shared)
    parseSheet(sheet, sst)
  }

  /** Parse one workbook's bytes → EVERY sheet, in workbook order, with
    * date-styled numeric cells decoded to ISO strings:
    * (sheet name, rows). Executor-side only — the full-fidelity sibling
    * of [[parse]] (which stays sheet1-only/raw-string for the pinned
    * src_xlsx contract). */
  private[sources] def parseBook(bytes: Array[Byte]): Seq[(String, Seq[Array[String]])] = {
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName.startsWith("xl/")) parts(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("no xl/workbook.xml part — not an xlsx?"))
    val rels = parts.getOrElse("xl/_rels/workbook.xml.rels", Array.empty[Byte])
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val dateStyles = parts.get("xl/styles.xml").map(parseStyles).getOrElse(Set.empty)
    parseWorkbookSheets(wb, rels).flatMap { case (name, part) =>
      parts.get(part).map(xml => name -> parseSheet(xml, shared, dateStyles))
    }
  }

  /** Distributed full-workbook scan: every .xlsx under `path` →
    * (file, sheet_idx, sheet, row_idx, cells), all sheets, dates decoded.
    * Same many-small-files fan-out as [[scan]]. */
  def scanBook(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.xlsx").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseBook(bytes).zipWithIndex.flatMap { case ((sheet, rows), si) =>
          rows.zipWithIndex.map { case (cells, ri) =>
            (file, si, sheet, ri, cells.toSeq)
          }
        }
      }
      .toDF("file", "sheet_idx", "sheet", "row_idx", "cells")
  }

  /** Distributed scan: every .xlsx under `path` → (file, row_idx, cells).
    * binaryFile is file-parallel; parse runs where the bytes land. */
  def scan(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.xlsx").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parse(bytes).zipWithIndex.map { case (cells, i) =>
          (file, i, cells.toSeq)
        }
      }
      .toDF("file", "row_idx", "cells")
  }

  // ---- deterministic writer (fixture + round-trip testing only) ----

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write a minimal valid single-sheet workbook (delegates to
    * [[writeBook]]). */
  def write(path: String, rows: Seq[Seq[Any]]): Unit =
    writeBook(path, Seq("Sheet1" -> rows))

  /** Write a minimal valid MULTI-SHEET workbook. Strings go through a
    * shared-strings table (what Excel itself emits); numbers (Int/Long/
    * Double) become numeric cells; java.time.LocalDate and [[DateSerial]]
    * become DATE-STYLED numeric cells (1900-system serial + a cellXfs
    * entry with builtin numFmtId 14, exactly what a curator's Excel
    * export carries); null skips the cell (sparse row).
    * Deterministic bytes: fixed entry order + zeroed zip timestamps. */
  def writeBook(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val sst = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstId(v: String): Int = sst.getOrElseUpdate(v, sst.size)

    def sheetXml(rows: Seq[Seq[Any]]): String = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        cells.zipWithIndex.foreach { case (v, ci) =>
          val ref = s"${colRef(ci)}${ri + 1}"
          v match {
            case null =>
            case s: String =>
              sb.append(s"""<c r="$ref" t="s"><v>${sstId(s)}</v></c>""")
            case d: java.time.LocalDate =>
              sb.append(s"""<c r="$ref" s="1"><v>${dateToSerial(d)}</v></c>""")
            case DateSerial(n) =>
              sb.append(s"""<c r="$ref" s="1"><v>$n</v></c>""")
            case n @ (_: Int | _: Long | _: Double) =>
              sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case other =>
              throw new IllegalArgumentException(s"unsupported cell: $other")
          }
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    // sheet XMLs FIRST (they populate the shared-strings table)
    val sheetParts = sheets.zipWithIndex.map { case ((_, rows), i) =>
      s"xl/worksheets/sheet${i + 1}.xml" -> sheetXml(rows)
    }

    val sstXml = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append(s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">""")
      sst.keys.foreach(s => sb.append(s"<si><t>${xmlEscape(s)}</t></si>"))
      sb.append("</sst>")
      sb.toString
    }
    // style index 1 = builtin numFmtId 14 (locale short date) — the one
    // date style the writer emits; the parser handles the full set.
    val stylesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<cellXfs count="2"><xf numFmtId="0" applyNumberFormat="0"/>""" +
      """<xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>"""

    val n = sheets.size
    val sheetOverrides = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
    val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString
    val sheetRels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString

    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
         """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
         """<Default Extension="xml" ContentType="application/xml"/>""" +
         """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
         sheetOverrides +
         """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
         """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
         """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
         """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
         s"""<sheets>$sheetDecls</sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         sheetRels +
         s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
         s"""<Relationship Id="rId${n + 2}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
         """</Relationships>"""),
      "xl/sharedStrings.xml" -> sstXml,
      "xl/styles.xml" -> stylesXml) ++ sheetParts

    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    parts.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(0L) // deterministic bytes: fixed zip timestamps
      zos.putNextEntry(e)
      zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    java.nio.file.Files.write(p, bos.toByteArray)
  }
}
