package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 — minimal PDF text extraction (reference main.py:914-978 reads table
  * text through pdfplumber). Pure-JVM parse of the PDF content-stream
  * layer: every `stream`/`endstream` segment is located, FlateDecode
  * streams are inflated with `java.util.zip.Inflater`, and text lines are
  * read from `BT`/`ET` blocks — one line per `(string) Tj` show (the
  * layout [[graft.sinks.PdfSink]] and simple text-report generators emit;
  * a full y-coordinate layout engine à la pdfplumber is out of scope and
  * documented as such in COVERAGE.md).
  *
  * The distributed shape is the multimodal one: `binaryFile` scan →
  * partition-wise decode, one parser per partition, no driver funnel.
  */
object PdfSource {

  /** Unescape a PDF literal string: `\(`, `\)`, `\\`, `\n`, `\r`, `\t`,
    * and octal `\ddd`. */
  private def unescape(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case d if d >= '0' && d <= '7' =>
            val end = math.min(i + 4, s.length)
            val oct = s.substring(i + 1, end).takeWhile(ch => ch >= '0' && ch <= '7')
            out.append(Integer.parseInt(oct, 8).toChar)
            i += 1 + oct.length
          case other => out.append(other); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return Array.empty
      }
      out.toByteArray
    } catch { case _: java.util.zip.DataFormatException => Array.empty }
    finally inf.end()
  }

  /** Extract text lines from raw PDF bytes as (page, line_no, text).
    * "Page" is the 1-based index of the text-bearing content stream —
    * exact for PDFs with one content stream per page (the common report
    * layout and everything [[graft.sinks.PdfSink]] writes). */
  def extractLines(data: Array[Byte]): Seq[(Int, Int, String)] = {
    // ISO-8859-1 maps bytes 1:1 to chars, so offsets in the string match
    // byte offsets and stream payloads survive the round-trip
    val raw = new String(data, StandardCharsets.ISO_8859_1)
    val streams = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while ({ i = raw.indexOf("stream", i); i >= 0 }) {
      // "endstream" also contains "stream" — require a real stream start:
      // the keyword is followed by an EOL per spec
      val afterKw = i + "stream".length
      val isStart = raw.startsWith("stream\r\n", i) || raw.startsWith("stream\n", i)
      if (isStart) {
        val contentStart = if (raw.startsWith("stream\r\n", i)) afterKw + 2
                           else afterKw + 1
        val end = raw.indexOf("endstream", contentStart)
        if (end < 0) { i = afterKw }
        else {
          // the dict immediately before the keyword declares the filter
          val dictStart = math.max(0, raw.lastIndexOf("<<", i))
          val dict = raw.substring(dictStart, i)
          var payload = raw.substring(contentStart, end)
            .stripSuffix("\n").stripSuffix("\r")
          if (dict.contains("/FlateDecode")) {
            val bytes = payload.getBytes(StandardCharsets.ISO_8859_1)
            payload = new String(inflate(bytes), StandardCharsets.ISO_8859_1)
          }
          streams += payload
          i = end + "endstream".length
        }
      } else i = afterKw
    }
    val tj = java.util.regex.Pattern.compile(
      """\(((?:[^()\\]|\\.)*)\)\s*Tj""")
    var page = 0
    streams.flatMap { s =>
      if (!s.contains("BT")) Nil
      else {
        val lines = scala.collection.mutable.ArrayBuffer.empty[String]
        var from = 0
        while ({ val bt = s.indexOf("BT", from); bt >= 0 && {
          val et = s.indexOf("ET", bt + 2)
          val block = if (et < 0) s.substring(bt) else s.substring(bt, et)
          val m = tj.matcher(block)
          while (m.find()) {
            // UTF-8 bytes were written raw; decode them back
            lines += new String(
              unescape(m.group(1)).getBytes(StandardCharsets.ISO_8859_1),
              StandardCharsets.UTF_8)
          }
          from = if (et < 0) s.length else et + 2
          true } }) ()
        if (lines.isEmpty) Nil
        else {
          page += 1
          lines.zipWithIndex.map { case (t, ln) => (page, ln + 1, t) }
        }
      }
    }.toSeq
  }

  /** S8 distributed read: every PDF under `path` (a file or directory)
    * parsed partition-wise into (file, page, line_no, text) rows. */
  def readTextRows(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // one parser scope per partition (mirrors the multimodal decode)
        it.flatMap { case (p, bytes) =>
          extractLines(bytes).map { case (pg, ln, t) => (p, pg, ln, t) }
        }
      }
      .toDF("file", "page", "line_no", "text")
  }
}
