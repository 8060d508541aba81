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

  test("colIndex handles one- and two-letter refs") {
    assert(Excel.colIndex("A1") === 0)
    assert(Excel.colIndex("Z9") === 25)
    assert(Excel.colIndex("AA3") === 26)
    assert(Excel.colIndex("AB12") === 27)
  }
}
