package graft.serve

import java.nio.charset.StandardCharsets

/** Minimal `multipart/form-data` request parser for the serving shim —
  * the upload envelope every reference POST endpoint accepts
  * (main.py:1776ff takes `UploadFile = File(...)` plus optional form
  * fields like `xml_format`). Byte-exact: payloads are arbitrary binary
  * (xlsx zip containers, JPEG/PNG, PDF), so the scan never round-trips
  * part bodies through a charset — only the ASCII headers are decoded.
  *
  * Scope: well-formed single-level form-data with CRLF line endings
  * (what browsers, curl, and every HTTP client library emit); nested
  * multipart and obsolete CR-only framing are out of scope and yield
  * an empty part list rather than a misparse.
  */
object Multipart {

  /** One form part: field `name`, the client `filename` when the part
    * is a file upload, raw body bytes. */
  final case class Part(name: String, filename: Option[String],
                        data: Array[Byte])

  /** Extract the boundary token from a Content-Type header value. */
  def boundaryOf(contentType: String): Option[String] =
    contentType.split(";").map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("boundary=") =>
        val v = p.substring("boundary=".length)
        if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
          v.substring(1, v.length - 1)
        else v
    }

  private def indexOf(hay: Array[Byte], needle: Array[Byte],
                      from: Int): Int = {
    var i = math.max(0, from)
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val HeaderEnd = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
  // attribute-boundary anchored: an unanchored name=" would match
  // INSIDE filename="..." when a client emits filename before name
  // (RFC 7578 mandates no attribute order)
  private val NameRe = """(?<![\w-])name="([^"]*)"""".r
  private val FilenameRe = """filename="([^"]*)"""".r

  /** Parse the request body. Malformed framing truncates the part list
    * (never throws, never mis-slices a binary payload). */
  def parse(body: Array[Byte], boundary: String): Seq[Part] = {
    val delim = ("--" + boundary).getBytes(StandardCharsets.US_ASCII)
    val parts = Seq.newBuilder[Part]
    var pos = indexOf(body, delim, 0)
    var done = pos < 0
    while (!done) {
      val after = pos + delim.length
      if (after + 1 < body.length &&
          body(after) == '-' && body(after + 1) == '-') done = true
      else {
        val headStart = after + 2 // skip the CRLF after the delimiter
        val headEnd = indexOf(body, HeaderEnd, headStart)
        if (headEnd < 0) done = true
        else {
          val headers = new String(body, headStart, headEnd - headStart,
            StandardCharsets.UTF_8)
          val dataStart = headEnd + HeaderEnd.length
          val next = indexOf(body, delim, dataStart)
          if (next < 0) done = true
          else {
            val dataEnd = math.max(dataStart, next - 2) // strip CRLF
            val disp = headers.linesIterator
              .find(_.toLowerCase.startsWith("content-disposition:"))
              .getOrElse("")
            val name = NameRe.findFirstMatchIn(disp).map(_.group(1))
            val filename = FilenameRe.findFirstMatchIn(disp).map(_.group(1))
            name.foreach { n =>
              parts += Part(n, filename,
                java.util.Arrays.copyOfRange(body, dataStart, dataEnd))
            }
            pos = next
          }
        }
      }
    }
    parts.result()
  }
}
