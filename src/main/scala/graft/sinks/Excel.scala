package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6/K7 — minimal Excel (.xlsx) source and sink with no external jars:
  * an xlsx file is a zip of OOXML parts, so the writer emits the four
  * required parts with `inlineStr` cells via ZipOutputStream, and the
  * reader extracts `xl/worksheets/sheet1.xml` and hands it to the
  * DISTRIBUTED Spark XML parser (rowTag=row) plus an optional driver-side
  * sharedStrings dictionary.
  *
  * K7's column-width autosize (reference main.py:704-714: max cell length
  * + 2, capped at 50 — the A11 aggregate) is emitted as `<cols>` hints.
  *
  * The reference reads/writes Excel via pandas/openpyxl (main.py:697-753);
  * peripheral per BASELINE.json, so the scope is the reference's actual
  * usage: one sheet, header row, string cells.
  */
object Excel {

  /** XML-escape + strip control bytes (same class as the F8 scrub): a
    * stray \x01 in a CSV cell would otherwise render sheet1.xml invalid
    * and Excel rejects the whole workbook. */
  private def esc(s: String): String =
    s.replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colLetters(i: Int): String = { // 0-based -> A, B, ..., AA
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Letters -> 0-based index (reader side). */
  def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  // ------------------------------------------------------------------
  // K7 writer
  // ------------------------------------------------------------------

  /** A11 width hints: max(len)+2 capped at 50, header included. */
  def columnWidths(df: DataFrame): Seq[Int] = {
    val aggs = df.columns.toSeq.map(c =>
      least(greatest(max(length(col("`" + c + "`").cast("string"))),
                     lit(c.length)) + 2, lit(50)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    df.columns.indices.map(i => if (row.isNullAt(i)) 2 + df.columns(i).length
                                else row.getInt(i))
  }

  def writeXlsx(df: DataFrame, path: String): Unit = {
    val cols = df.columns.toSeq
    val widths = columnWidths(df)
    val zip = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def part(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      def w(s: String): Unit = zip.write(s.getBytes(StandardCharsets.UTF_8))
      w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">")
      w("\n<cols>")
      widths.zipWithIndex.foreach { case (width, i) =>
        w(s"""<col min="${i + 1}" max="${i + 1}" width="$width"/>""")
      }
      w("</cols>\n<sheetData>")
      def rowXml(rowNo: Int, values: Seq[String]): String = {
        val cells = values.zipWithIndex.map { case (v, i) =>
          // xml:space: Excel (and whitespace-trimming XML readers) would
          // otherwise silently strip significant edge whitespace
          val sp = if (v.nonEmpty && (v.head.isWhitespace || v.last.isWhitespace))
            " xml:space=\"preserve\"" else ""
          s"""<c r="${colLetters(i)}$rowNo" t="inlineStr"><is><t$sp>${esc(v)}</t></is></c>"""
        }
        s"""\n<row r="$rowNo">${cells.mkString}</row>"""
      }
      w(rowXml(1, cols))
      var rowNo = 2
      val it = df.coalesce(4).toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        w(rowXml(rowNo, cols.indices.map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString)))
        rowNo += 1
      }
      w("\n</sheetData>\n</worksheet>")
      zip.closeEntry()
    } finally zip.close()
  }

  // ------------------------------------------------------------------
  // S6 reader
  // ------------------------------------------------------------------

  private def extractEntry(xlsx: Path, entry: String): Option[Path] = {
    val zf = new ZipFile(xlsx.toFile)
    try Option(zf.getEntry(entry)).map { e =>
      val tmp = Files.createTempFile("graft_xlsx", ".xml")
      Files.copy(zf.getInputStream(e), tmp,
                 java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      tmp
    } finally zf.close()
  }

  /** Read sheet1 as an all-string DataFrame with the first row as header.
    * Supports inlineStr cells, inline `<v>` values, and shared strings
    * (t="s" indexes into a driver-loaded dictionary — it is a dictionary,
    * not data, exactly the broadcast-lookup shape). */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    val sheet = extractEntry(Paths.get(path), "xl/worksheets/sheet1.xml")
      .getOrElse(throw new IllegalArgumentException(
        "Not an xlsx file: missing xl/worksheets/sheet1.xml"))

    val sst: Seq[String] = extractEntry(Paths.get(path), "xl/sharedStrings.xml") match {
      case None => Nil
      case Some(p) =>
        val df = spark.read.format("xml").option("rowTag", "si").load(p.toString)
        if (df.columns.contains("t"))
          df.select(col("t").cast("string")).collect().map(r =>
            Option(r.getString(0)).getOrElse("")).toSeq
        else Nil
    }

    val rows = spark.read.format("xml")
      .option("rowTag", "row")
      .option("attributePrefix", "_")
      .option("valueTag", "_VALUE")
      // keep cell text verbatim: surrounding whitespace in a cell value is
      // data, not formatting
      .option("ignoreSurroundingSpaces", "false")
      .load(sheet.toString)

    // cells: array<struct> with _r ref, _t type, is.t inline text, v value
    if (!rows.columns.contains("c"))
      throw new IllegalArgumentException(
        "xlsx sheet has no cells (empty sheet1.xml)")
    val (cellsCol, cellType) = rows.schema("c").dataType match {
      case org.apache.spark.sql.types.ArrayType(
            st: org.apache.spark.sql.types.StructType, _) => (col("c"), st)
      case st: org.apache.spark.sql.types.StructType      => (array(col("c")), st)
      case _ => throw new IllegalArgumentException("unrecognized sheet cell shape")
    }
    def cellField(c: Column, names: String*): Column =
      names.foldLeft(c)((acc, n) => acc.getField(n))
    def has(path0: String*): Boolean = {
      var dt: org.apache.spark.sql.types.DataType = cellType
      path0.forall { n =>
        dt match {
          case st: org.apache.spark.sql.types.StructType if st.fieldNames.contains(n) =>
            dt = st(n).dataType; true
          case _ => false
        }
      }
    }
    val sstMap =
      if (sst.isEmpty) map(lit("\u0000none"), lit(""))
      else map(sst.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit(i.toString), lit(s))
      }: _*)

    val inline = if (has("is", "t")) cellField(col("cell"), "is", "t").cast("string")
                 else lit(null).cast("string")
    val vCol = if (has("v")) cellField(col("cell"), "v").cast("string")
               else lit(null).cast("string")
    val tCol = if (has("_t")) cellField(col("cell"), "_t").cast("string")
               else lit(null).cast("string")

    val exploded = rows
      .select(col("_r").cast("long").as("rowno"), explode(cellsCol).as("cell"))
      .select(col("rowno"),
        col("cell").getField("_r").cast("string").as("ref"),
        when(tCol === "inlineStr", inline)
          // try_element_at: a shared-string index absent from the parsed
          // dictionary (e.g. rich-text runs the flat reader missed) must
          // yield null, not throw under default ANSI map-key semantics.
          // The index is normalized through a numeric cast ("0.0" -> "0"):
          // when any NUMERIC cell makes inference type v as double, integer
          // indexes render with a trailing .0 — or in scientific notation
          // past ~1e7 — and would miss every dictionary key. Casting
          // double->long->string is rendering-independent; a malformed
          // index try_casts to null and falls through to a null value.
          .when(tCol === "s",
            try_element_at(sstMap,
              // both casts must be try_: "NaN"/"1e300" survive the double
              // parse but overflow the long cast, which throws under ANSI
              vCol.try_cast("double").try_cast("long").cast("string")))
          .otherwise(vCol).as("value"))

    // header: row 1 (tiny) -> column index -> name
    val header = exploded.filter(col("rowno") === 1)
      .select(col("ref"), col("value")).collect()
      .map(r => colIndex(r.getString(0)) -> Option(r.getString(1)).getOrElse(""))
      .sortBy(_._1)
    // pivot the data rows by the header cell's ACTUAL column index — not
    // its position in the header array: xlsx omits empty cells, so a
    // header with gaps (A1, C1, no B1) would otherwise silently misalign
    // every data column after the gap
    if (header.isEmpty)
      throw new IllegalArgumentException(
        "xlsx sheet has no header row (row 1 has no cells)")
    val letterIdx = udfFreeColIndex(col("ref"))
    val aggs = header.map { case (idx, n) =>
      max(when(letterIdx === idx, col("value"))).as(n)
    }.toSeq
    exploded.filter(col("rowno") > 1)
      .groupBy(col("rowno"))
      .agg(aggs.head, aggs.tail: _*)
      // sheet order must survive the round trip (pandas read_excel
      // preserves it); without the sort, output order is hash-partition
      // order. Sheets are upload-bounded, so the sort is dictionary-sized.
      .orderBy(col("rowno"))
      .drop("rowno")
  }

  /** A1-style ref -> 0-based column index as a pure expression (1-2 letter
    * refs cover 702 columns; the reference never exceeds that). */
  private def udfFreeColIndex(ref: Column): Column = {
    val letters = regexp_extract(ref, "^([A-Z]+)", 1)
    when(length(letters) === 1, ascii(letters) - lit('A'.toInt))
      .otherwise(
        (ascii(substring(letters, 1, 1)) - lit('A'.toInt) + 1) * 26 +
          (ascii(substring(letters, 2, 1)) - lit('A'.toInt)))
  }
}
