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

  test("colIndex handles one- and two-letter refs") {
    assert(Excel.colIndex("A1") === 0)
    assert(Excel.colIndex("Z9") === 25)
    assert(Excel.colIndex("AA3") === 26)
    assert(Excel.colIndex("AB12") === 27)
  }
}
