package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S7 — JSON source with `json_normalize`-style flattening (reference
  * `process_json_to_csv` main.py:756-794): nested objects become dotted
  * column names; a top-level object containing a list takes the FIRST list
  * value (in schema field order) as the row set (main.py:767-771).
  */
object JsonSource {

  /** Recursive struct flatten to dotted column names (pandas
    * `json_normalize` semantics; arrays are kept as-is like json_normalize
    * leaves lists in cells). */
  def flattenStructs(df: DataFrame): DataFrame = {
    def walk(dt: DataType, c: Column, name: String): Seq[(String, Column)] =
      dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f =>
            walk(f.dataType, c.getField(f.name), s"$name.${f.name}"))
        case _ => Seq(name -> c)
      }
    val cols = df.schema.fields.toSeq.flatMap {
      case StructField(n, st: StructType, _, _) =>
        st.fields.toSeq.flatMap(f =>
          walk(f.dataType, col("`" + n + "`").getField(f.name), s"$n.${f.name}"))
      case f => Seq(f.name -> col("`" + f.name + "`"))
    }
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** First non-empty line of a file, streaming up to `maxBytes` total —
    * never materializes more than the line itself. Returns "" when the
    * budget runs out mid-line (caller treats that as not-NDJSON). */
  private def readFirstNonEmptyLine(path: String, maxBytes: Int): String = {
    val in = new java.io.BufferedInputStream(
      new java.io.FileInputStream(path), 1 << 16)
    try {
      val out = new java.io.ByteArrayOutputStream()
      var scanned = 0L
      var b = in.read()
      while (b >= 0 && scanned < maxBytes) {
        scanned += 1
        if (b == '\n') {
          val line = new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8)
          if (line.trim.nonEmpty) return line
          out.reset()
        } else if (b != '\r') out.write(b)
        b = in.read()
      }
      if (b < 0) {
        // no trailing newline: the remainder IS the last (only) line
        val line = new String(out.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
        if (line.trim.nonEmpty) line else ""
      } else "" // budget exhausted mid-line
    } finally in.close()
  }

  /** Read a JSON file: top-level array of objects (multiLine) or NDJSON;
    * a top-level OBJECT picks its first array-of-struct field as the row
    * set (main.py:767-771). The array/object distinction comes from the
    * file's first non-whitespace byte — a one-element top-level ARRAY also
    * parses to one row, so row count alone cannot tell them apart. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val head = {
      val in = new java.io.FileInputStream(path)
      try {
        val buf = new Array[Byte](64 * 1024)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0),
          java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
    val isObject =
      head.dropWhile(c => c.isWhitespace || c == '﻿').headOption.contains('{')
    // NDJSON detection: if the first line is a COMPLETE standalone JSON
    // value, the file is line-delimited and must be read with
    // multiLine=false — the multiLine reader parses exactly one root value
    // per file and would silently truncate an NDJSON feed to one record.
    // BOM must be stripped here too: Jackson rejects a BOM-prefixed line,
    // which would misroute a BOM'd NDJSON feed to multiLine=true (one row).
    // The probe streams to the first newline rather than slicing the 64KB
    // head: an NDJSON feed whose FIRST record exceeds the head would
    // otherwise fail the parse and silently truncate to one row. Bounded
    // at 32MB — beyond that the old multiLine fallback applies.
    val firstLine = readFirstNonEmptyLine(path, maxBytes = 32 << 20)
      .dropWhile(c => c.isWhitespace || c == '﻿')
    val ndjson =
      try {
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(firstLine)
        // a pretty-printed doc's first line ("{" / "[") fails the parse;
        // a complete single-line doc parses but multiLine=false reads it
        // identically, so treating it as NDJSON is safe
        true
      } catch { case _: Exception => false }
    val df = spark.read.option("multiLine", (!ndjson).toString).json(path)
    val rows =
      if (isObject && df.head(2).length == 1) {
        df.schema.fields.collectFirst {
          case StructField(n, ArrayType(_: StructType, _), _, _) => n
        } match {
          case Some(listField) =>
            df.select(explode(col("`" + listField + "`")).as("r")).select("r.*")
          case None => df
        }
      } else df
    flattenStructs(rows)
  }
}
