package graft.sinks

import java.nio.file.Files
import java.util.zip.ZipFile

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExcelSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory("graftx").resolve(name).toString

  test("K7 writer emits a valid zip with the four OOXML parts + width hints") {
    import spark.implicits._
    val df = Seq(("1", "short", "a much longer cell value here"),
                 ("2", "x", "y")).toDF("id", "a", "b")
    val path = tmp("out.xlsx")
    Excel.writeXlsx(df, path)
    val zf = new ZipFile(path)
    try {
      val names = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      assert(names.contains("[Content_Types].xml"))
      assert(names.contains("xl/workbook.xml"))
      assert(names.contains("xl/worksheets/sheet1.xml"))
      val sheet = new String(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes())
      // A11 autosize: max(len)+2 capped at 50; col b max len 29 -> 31
      assert(sheet.contains("""<col min="3" max="3" width="31"/>"""))
      assert(sheet.contains("<is><t>short</t></is>"))
    } finally zf.close()
  }

  test("S6 round-trip: write then read back preserves values and header") {
    import spark.implicits._
    val df = Seq(("1", "Name & Co", "10"), ("2", "<tag>", "")).toDF("id", "name", "v")
    val path = tmp("rt.xlsx")
    Excel.writeXlsx(df, path)
    val back = Excel.readXlsx(spark, path).orderBy("id").collect()
    assert(back.map(_.getString(1)).toSeq === Seq("Name & Co", "<tag>"))
    assert(back(1).getString(2) === "") // empty cell round-trips
  }

  test("S6 foreign xlsx with a GAP in the header row: data stays under its " +
       "own header, never shifted into the gap") {
    // xlsx omits empty cells entirely: header A1='x', C1='y' (no B1), data
    // A2='1', B2='stray', C2='2'. 'y' data must come from column C.
    val path = tmp("gap.xlsx")
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>x</t></is></c><c r="C1" t="inlineStr"><is><t>y</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>1</t></is></c><c r="B2" t="inlineStr"><is><t>stray</t></is></c><c r="C2" t="inlineStr"><is><t>2</t></is></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(sheet.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
    val back = Excel.readXlsx(spark, path).collect()
    assert(back.length === 1)
    val r = back.head
    assert(r.getAs[String]("x") === "1")
    assert(r.getAs[String]("y") === "2") // NOT 'stray' from column B
  }

  test("S6 shared-string indexes survive double rendering — trailing .0 " +
       "AND scientific notation — via the numeric-cast normalization; " +
       "malformed indexes fall through to null without throwing") {
    val path = tmp("sst.xlsx")
    // 13 shared strings so index 12 exists; a numeric cell in the data
    // column makes Spark's XML inference type v as DOUBLE, so indexes
    // arrive rendered "12.0" / "1.2E1" instead of "12"
    val sst =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="13" uniqueCount="13">
        |""".stripMargin +
      (0 to 12).map(i => s"<si><t>s$i</t></si>").mkString("\n") +
      "\n</sst>"
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>12.0</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>1.2E1</v></c></row>
        |<row r="4"><c r="A4"><v>3.5</v></c></row>
        |<row r="5"><c r="A5" t="s"><v>NaN</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("xl/sharedStrings.xml"))
      zos.write(sst.getBytes("UTF-8")); zos.closeEntry()
      zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(sheet.getBytes("UTF-8")); zos.closeEntry()
    } finally zos.close()
    val back = Excel.readXlsx(spark, path).orderBy("h").collect()
      .map(r => Option(r.getAs[String]("h")).orNull)
    // 12.0 and 1.2E1 both resolve to shared string 12; 3.5 is a plain
    // numeric cell; the NaN index yields null rather than an ANSI throw
    assert(back.toSet === Set("s12", "3.5", null))
    assert(back.count(_ == "s12") === 2)
  }

  test("colIndex handles one- and two-letter refs") {
    assert(Excel.colIndex("A1") === 0)
    assert(Excel.colIndex("Z9") === 25)
    assert(Excel.colIndex("AA3") === 26)
    assert(Excel.colIndex("AB12") === 27)
  }
}
