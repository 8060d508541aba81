package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** K8 — minimal PDF 1.4 writer for text reports (reference main.py:1056-1118
  * emits the same content through reportlab). Deterministic bytes: fixed
  * header, one Helvetica font object, one content stream per page with one
  * `Td`/`Tj` pair per line, classic xref table. No compression, no
  * dependencies.
  *
  * String bytes are written as UTF-8 with `(`/`)`/`\` escaped — our own
  * extractor ([[graft.sources.PdfSource]]) round-trips them exactly.
  * External viewers render non-Latin-1 text approximately (real font
  * CMaps are out of scope — the reference's reportlab path has the same
  * Cyrillic caveat with its builtin fonts); the DATA survives byte-exact.
  */
object PdfSink {

  private[sinks] def escapeText(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      .replace("\r", " ").replace("\n", " ")

  /** Write `lines` as a paginated text PDF. Text starts at y=778 with a
    * 14pt leading on an 842pt page, so at most 55 lines stay inside the
    * MediaBox — the default keeps every line visible in a real viewer. */
  def writeTextPdf(lines: Seq[String], path: String,
                   linesPerPage: Int = 55): Unit = {
    require(linesPerPage <= 55,
      s"linesPerPage $linesPerPage would render below the MediaBox (max 55)")
    require(linesPerPage >= 1, "linesPerPage must be >= 1")
    val pages = if (lines.isEmpty) Seq(Seq.empty[String])
                else lines.grouped(linesPerPage).toSeq
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def write(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.UTF_8))
    def beginObj(): Unit = offsets += out.size()

    write("%PDF-1.4\n")
    // obj 1: catalog; obj 2: page tree; obj 3: font;
    // then per page i: page obj (4+2i), content obj (5+2i)
    val nPages = pages.length
    val pageObjIds = (0 until nPages).map(i => 4 + 2 * i)
    beginObj()
    write("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj()
    write(s"2 0 obj\n<< /Type /Pages /Kids [" +
      pageObjIds.map(id => s"$id 0 R").mkString(" ") +
      s"] /Count $nPages >>\nendobj\n")
    beginObj()
    write("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pages.zipWithIndex.foreach { case (pl, i) =>
      val pageId = 4 + 2 * i
      val contId = 5 + 2 * i
      beginObj()
      write(s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
        "/MediaBox [0 0 595 842] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contId 0 R >>\nendobj\n")
      val content = new StringBuilder("BT\n/F1 10 Tf\n50 792 Td\n")
      pl.foreach { l =>
        content.append("0 -14 Td\n(").append(escapeText(l)).append(") Tj\n")
      }
      content.append("ET\n")
      val cb = content.toString.getBytes(StandardCharsets.UTF_8)
      beginObj()
      write(s"$contId 0 obj\n<< /Length ${cb.length} >>\nstream\n")
      out.write(cb)
      write("\nendstream\nendobj\n")
    }
    val xrefPos = out.size()
    val nObjs = 3 + 2 * nPages
    write(s"xref\n0 ${nObjs + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => write(f"$o%010d 00000 n \n"))
    write(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF\n")
    Files.write(Paths.get(path), out.toByteArray)
  }

  /** The K8 report as a real PDF artifact: [[Reports.tableReportLines]]
    * content (title, header, first-50 rows) through [[writeTextPdf]]. */
  def writeTableReportPdf(df: org.apache.spark.sql.DataFrame,
                          orderCol: String, title: String, path: String,
                          maxRows: Int = 50, linesPerPage: Int = 55): Unit = {
    val lines = Reports.tableReportLines(df, orderCol, title, maxRows)
      .orderBy("line_no").select("line").collect().map(_.getString(0)).toSeq
    writeTextPdf(lines, path, linesPerPage)
  }
}
