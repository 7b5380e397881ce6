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

  /** One worksheet part → rows of cell strings (null = absent cell). */
  private def parseSheet(xml: Array[Byte],
                         shared: IndexedSeq[String]): Seq[Array[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(xml))
    var cellCol = -1
    var cellType = ""
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
              if (sawValue) cells += cellCol -> cellText.toString
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

  /** Write a minimal valid single-sheet workbook. Strings go through a
    * shared-strings table (what Excel itself emits); numbers (Int/Long/
    * Double) become numeric cells; null skips the cell (sparse row).
    * Deterministic bytes: fixed entry order + zeroed zip timestamps. */
  def write(path: String, rows: Seq[Seq[Any]]): Unit = {
    val sst = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstId(v: String): Int = sst.getOrElseUpdate(v, sst.size)

    val sheetXml = new StringBuilder
    sheetXml.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheetXml.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (cells, ri) =>
      sheetXml.append(s"""<row r="${ri + 1}">""")
      cells.zipWithIndex.foreach { case (v, ci) =>
        val ref = s"${colRef(ci)}${ri + 1}"
        v match {
          case null =>
          case s: String =>
            sheetXml.append(s"""<c r="$ref" t="s"><v>${sstId(s)}</v></c>""")
          case n @ (_: Int | _: Long | _: Double) =>
            sheetXml.append(s"""<c r="$ref"><v>$n</v></c>""")
          case other =>
            throw new IllegalArgumentException(s"unsupported cell: $other")
        }
      }
      sheetXml.append("</row>")
    }
    sheetXml.append("</sheetData></worksheet>")

    val sstXml = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append(s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">""")
      sst.keys.foreach(s => sb.append(s"<si><t>${xmlEscape(s)}</t></si>"))
      sb.append("</sst>")
      sb.toString
    }

    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
         """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
         """<Default Extension="xml" ContentType="application/xml"/>""" +
         """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
         """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
         """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
         """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
         """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
         """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
         """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
         """</Relationships>"""),
      "xl/sharedStrings.xml" -> sstXml,
      "xl/worksheets/sheet1.xml" -> sheetXml.toString)

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
