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

  private val LengthRe = java.util.regex.Pattern.compile("""/Length\s+(\d+)""")

  /** A direct `/Length N` value, or None when absent or an indirect
    * reference (`/Length N G R` — the number is an object id, not a
    * length; a regex lookahead would backtrack into a wrong partial
    * match, so the reference check is explicit). */
  private def directLength(dict: String): Option[Int] = {
    val m = LengthRe.matcher(dict)
    if (!m.find()) None
    else {
      var j = m.end()
      while (j < dict.length && Character.isWhitespace(dict.charAt(j))) j += 1
      val gStart = j
      while (j < dict.length && Character.isDigit(dict.charAt(j))) j += 1
      val hasGen = j > gStart
      while (j < dict.length && Character.isWhitespace(dict.charAt(j))) j += 1
      val indirect = hasGen && j < dict.length && dict.charAt(j) == 'R'
      if (indirect) None else scala.util.Try(m.group(1).toInt).toOption
    }
  }

  /** Tj-shown strings from one decoded content stream, via a
    * string-literal-aware scan: `BT`/`ET`/`endstream`-looking bytes INSIDE
    * a `(...)` literal never terminate anything (a report cell containing
    * "MARKET" has the bytes "ET" in it). Literals handle `\`-escapes and
    * balanced nested parens per spec. Returns None when the stream has no
    * `BT` text block at all. */
  private def textLines(s: String): Option[Seq[String]] = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var hasBT = false
    var inText = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(ch).append(s.charAt(i + 1)); i += 2 }
          else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        var j = i
        while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
        if (inText && s.startsWith("Tj", j)) {
          // UTF-8 bytes were written raw; decode them back
          lines += new String(
            unescape(sb.toString).getBytes(StandardCharsets.ISO_8859_1),
            StandardCharsets.UTF_8)
          i = j + 2
        }
      } else if (c == 'B' && s.startsWith("BT", i) &&
                 (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)))) {
        hasBT = true; inText = true; i += 2
      } else if (c == 'E' && s.startsWith("ET", i) &&
                 (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)))) {
        inText = false; i += 2
      } else i += 1
    }
    if (hasBT) Some(lines.toSeq) else None
  }

  /** Extract text lines from raw PDF bytes as (page, line_no, text).
    * "Page" is the 1-based index of the text-bearing content stream —
    * exact for PDFs with one content stream per page (the common report
    * layout and everything [[graft.sinks.PdfSink]] writes). Stream bounds
    * come from the dict's direct `/Length` when present (so payload bytes
    * that happen to spell "endstream" can't truncate the stream); the
    * keyword scan is the fallback for indirect-length PDFs. */
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
        // the dict immediately before the keyword declares filter + length
        val dictStart = math.max(0, raw.lastIndexOf("<<", i))
        val dict = raw.substring(dictStart, i)
        val declared = directLength(dict)
        val end = declared match {
          case Some(len) if contentStart + len <= raw.length =>
            contentStart + len
          case _ => raw.indexOf("endstream", contentStart)
        }
        if (end < 0) { i = afterKw }
        else {
          var payload = raw.substring(contentStart, end)
          if (declared.isEmpty)
            payload = payload.stripSuffix("\n").stripSuffix("\r")
          if (dict.contains("/FlateDecode")) {
            val bytes = payload.getBytes(StandardCharsets.ISO_8859_1)
            payload = new String(inflate(bytes), StandardCharsets.ISO_8859_1)
          }
          streams += payload
          val es = raw.indexOf("endstream", end)
          i = if (es < 0) raw.length else es + "endstream".length
        }
      } else i = afterKw
    }
    var page = 0
    streams.flatMap { s =>
      textLines(s) match {
        case Some(lines) if lines.nonEmpty =>
          page += 1
          lines.zipWithIndex.map { case (t, ln) => (page, ln + 1, t) }
        case _ => Nil
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
