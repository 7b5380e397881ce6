package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Parser-contract pins for the pure-JDK xlsx reader — the cases a real
  * Excel export exercises that the oracled src_xlsx fixture (dense rows,
  * shared strings) cannot: sparse rows, inline strings, rich-text runs,
  * missing r attributes, XML escapes, and the A1 column arithmetic. */
class XlsxSpec extends AnyFunSuite {

  private def sheetZip(sheetXml: String, sstXml: Option[String] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    sstXml.foreach(put("xl/sharedStrings.xml", _))
    put("xl/worksheets/sheet1.xml", sheetXml)
    zos.close()
    bos.toByteArray
  }

  test("A1 column arithmetic: A=0, Z=25, AA=26, BC=54") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA23") == 26)
    assert(Xlsx.colIndex("BC23") == 54)
  }

  test("writer round-trip: shared strings, numbers, XML escapes, determinism") {
    val rows = Seq(
      Seq("id", "name <&\"tricky>", "score"),
      Seq(1, "alpha", 2.5),
      Seq(2, "name <&\"tricky>", 7L)) // dup string → one sst entry
    val p1 = java.nio.file.Files.createTempFile("graft-xlsx", ".xlsx")
    val p2 = java.nio.file.Files.createTempFile("graft-xlsx", ".xlsx")
    try {
      Xlsx.write(p1.toString, rows)
      Xlsx.write(p2.toString, rows)
      val b1 = java.nio.file.Files.readAllBytes(p1)
      assert(java.util.Arrays.equals(b1, java.nio.file.Files.readAllBytes(p2)),
        "writer is not byte-deterministic")
      val parsed = Xlsx.parse(b1)
      assert(parsed.map(_.toSeq) == Seq(
        Seq("id", "name <&\"tricky>", "score"),
        Seq("1", "alpha", "2.5"),
        Seq("2", "name <&\"tricky>", "7")))
    } finally { java.nio.file.Files.delete(p1); java.nio.file.Files.delete(p2) }
  }

  test("sparse rows: r-referenced cells land at their true column, gaps stay null") {
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1"><v>1</v></c><c r="D1"><v>4</v></c></row>
        |<row r="2"><c r="B2"><v>22</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = Xlsx.parse(sheetZip(sheet))
    assert(rows.map(_.toSeq) == Seq(
      Seq("1", null, null, "4"),
      Seq(null, "22")))
  }

  test("inline strings, formula strings, and cells without r attributes") {
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row><c t="inlineStr"><is><t>hello</t></is></c><c><v>3.14</v></c>
        |<c t="str"><v>computed</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = Xlsx.parse(sheetZip(sheet))
    assert(rows.map(_.toSeq) == Seq(Seq("hello", "3.14", "computed")))
  }

  test("shared strings with rich-text runs flatten to concatenated text") {
    val sst =
      """<?xml version="1.0"?><sst count="2" uniqueCount="2">
        |<si><t>plain</t></si>
        |<si><r><t>bold </t></r><r><t>part</t></r></si>
        |</sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>1</v></c><c r="B1" t="s"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = Xlsx.parse(sheetZip(sheet, Some(sst)))
    assert(rows.map(_.toSeq) == Seq(Seq("bold part", "plain")))
  }

  test("r-less cells restart at column 0 on every row (r10 regression)") {
    // Pre-r10 cellCol carried across rows: row 2's r-less cell landed at
    // row 1's last column + 1 instead of column 0, silently shifting
    // every column of every row after the first.
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row><c><v>1</v></c><c><v>2</v></c><c><v>3</v></c></row>
        |<row><c><v>4</v></c></row>
        |<row><c><v>5</v></c><c><v>6</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = Xlsx.parse(sheetZip(sheet))
    assert(rows.map(_.toSeq) == Seq(
      Seq("1", "2", "3"), Seq("4"), Seq("5", "6")))
  }

  test("inline rich-text runs concatenate like shared-string runs (r10 regression)") {
    // Pre-r10 each <t> run emitted its own (col, text) entry and the
    // row fill was last-wins: 'a'+'b' read back as just 'b'.
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row><c t="inlineStr"><is><r><t>a</t></r><r><t>b</t></r></is></c>
        |<c><v>9</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val rows = Xlsx.parse(sheetZip(sheet))
    assert(rows.map(_.toSeq) == Seq(Seq("ab", "9")))
  }

  test("1900-system serial conversion incl. the Lotus leap-bug gap") {
    // serial 1 = 1900-01-01; 59 = 1900-02-28; 60 = the PHANTOM
    // 1900-02-29 (pinned clamp: 1900-02-28); 61 = 1900-03-01 (the gap:
    // post-60 serials sit one ahead of the real calendar); modern dates
    // land exactly; fractional serials (datetimes) truncate to the day.
    assert(Xlsx.serialToIso(1) == "1900-01-01")
    assert(Xlsx.serialToIso(59) == "1900-02-28")
    assert(Xlsx.serialToIso(60) == "1900-02-28")
    assert(Xlsx.serialToIso(61) == "1900-03-01")
    assert(Xlsx.serialToIso(25569) == "1970-01-01")
    assert(Xlsx.serialToIso(46248) == "2026-08-14")
    assert(Xlsx.serialToIso(46248.73) == "2026-08-14")
    // dateToSerial is the inverse away from the phantom, on BOTH sides
    // of the gap
    for (iso <- Seq("1900-01-01", "1900-02-28", "1900-03-01", "1970-01-01",
                    "2026-08-14", "1995-06-17"))
      assert(Xlsx.serialToIso(
        Xlsx.dateToSerial(java.time.LocalDate.parse(iso)).toDouble) == iso)
  }

  test("styles.xml: builtin date ids, custom y/d codes, minutes-only m excluded") {
    val styles =
      """<?xml version="1.0"?><styleSheet>
        |<numFmts count="2">
        |<numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/>
        |<numFmt numFmtId="165" formatCode="[h]:mm:ss &quot;dur&quot;"/>
        |</numFmts>
        |<cellXfs count="5">
        |<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="4"/>
        |<xf numFmtId="164"/><xf numFmtId="165"/>
        |</cellXfs></styleSheet>""".stripMargin
    // style 1 (builtin 14) and 3 (custom with y/d) are dates; style 2
    // (builtin numeric 4) and 4 (elapsed-time h:mm:ss, no y/d) are not
    assert(Xlsx.parseStyles(styles.getBytes("UTF-8")) == Set(1, 3))
  }

  test("writeBook/parseBook: multi-sheet order, date decode, raw sheet1 contract") {
    val sheets = Seq(
      "export" -> Seq(Seq("id", "d"),
                      Seq[Any](1, java.time.LocalDate.parse("2026-08-14")),
                      Seq[Any](2, java.time.LocalDate.parse("1900-02-28"))),
      "audit"  -> Seq(Seq("id", "d"), Seq[Any](3, Xlsx.DateSerial(60))))
    val p = java.nio.file.Files.createTempFile("graft-xlsxd", ".xlsx")
    try {
      Xlsx.writeBook(p.toString, sheets)
      val book = Xlsx.parseBook(java.nio.file.Files.readAllBytes(p))
      assert(book.map(_._1) == Seq("export", "audit"), "sheet order via r:id → rels")
      assert(book(0)._2.map(_.toSeq) == Seq(
        Seq("id", "d"), Seq("1", "2026-08-14"), Seq("2", "1900-02-28")))
      assert(book(1)._2.map(_.toSeq) == Seq(Seq("id", "d"), Seq("3", "1900-02-28")))
      // the pinned sheet1-only src_xlsx contract stays RAW: same bytes,
      // parse() surfaces the serial string, not the decoded date
      val raw = Xlsx.parse(java.nio.file.Files.readAllBytes(p))
      assert(raw.map(_.toSeq) == Seq(
        Seq("id", "d"), Seq("1", "46248"), Seq("2", "59")))
    } finally java.nio.file.Files.delete(p)
  }

  test("XXE hygiene: a doctype with an external entity does not resolve") {
    val sheet =
      """<?xml version="1.0"?><!DOCTYPE x [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>&xxe;</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    // DTD support is off: the parse must fail loudly, never fetch the file
    intercept[Exception] { Xlsx.parse(sheetZip(sheet)) }
  }
}
