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
