package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.XmlSource.{AttrPrefix, ValueTag}

/** K5/K6 — JSON sink (reference `process_csv_to_json` main.py:797-835) and
  * the XML→JSON key conventions (`xml_to_dict` main.py:841-862).
  *
  * Rows serialize via `to_json(struct(*))` — distributed and codegen'd; the
  * array brackets / `{data,total,exported_at}` envelope are driver-side
  * framing. `exported_at` is injectable (F12 determinism).
  */
object JsonSink {

  /** Rows as JSON object strings (F16). */
  def jsonRows(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(c => col("`" + c + "`")).toSeq: _*))
      .as("json"))

  /** K5 `array` format: `[ {...}, {...} ]`. */
  def writeArray(df: DataFrame, path: String): Unit =
    writeFramed(df, path, "[\n  ", ",\n  ", _ => "\n]")

  /** K5 `object` format: `{"data": [...], "total": n, "exported_at": ts}`.
    * `total` is counted DURING the byte drain (rows precede the framing),
    * so the input is scanned once, not count()+drain twice. */
  def writeEnvelope(df: DataFrame, path: String, exportedAt: String): Unit =
    writeFramed(df, path, "{\n\"data\": [\n  ", ",\n  ",
      n => s"\n],\n\"total\": $n,\n\"exported_at\": \"$exportedAt\"\n}")

  /** Row serialization runs DISTRIBUTED (the [[PartFiles]] byte drain,
    * separator as the writer's lineSep — cluster-safe part placement is
    * PartFiles' contract); the driver trims the one trailing separator
    * and counts rows by counting `\n` bytes — valid because `to_json`
    * escapes newlines, so the only raw newlines in the stream are the
    * one per separator. */
  private def writeFramed(df: DataFrame, path: String, head: String,
                          sep: String, tail: Long => String): Unit = {
    require(sep.count(_ == '\n') == 1, "separator must carry exactly one newline")
    val sepBytes = sep.getBytes(StandardCharsets.UTF_8)
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(
      Paths.get(path), StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING))
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    try {
      w(head)
      var newlines = 0L
      // delay-write the final sepBytes.length bytes: the stream ends with
      // one trailing separator that must not reach the file
      var pending = Array.empty[Byte]
      PartFiles.drainBytes(
        jsonRows(df).withColumnRenamed("json", "value"), sep) { (buf, n) =>
        var i = 0
        while (i < n) { if (buf(i) == '\n') newlines += 1; i += 1 }
        val combined = pending ++ buf.take(n)
        val keep = math.max(0, combined.length - sepBytes.length)
        out.write(combined, 0, keep)
        pending = combined.drop(keep)
      }
      if (!java.util.Arrays.equals(pending, sepBytes)) out.write(pending)
      w(tail(newlines))
    } finally out.close()
  }

  // ------------------------------------------------------------------
  // K6: XML -> JSON with @attr / #text key conventions
  // ------------------------------------------------------------------

  /** Recursively rename the XML reader's `_attr`/`_VALUE` fields to the
    * reference's `@attr`/`#text` JSON spelling (main.py:846-848), emitting
    * a struct expression mirror of the schema. */
  def xmlJsonShape(dt: DataType, c: Column): Column = dt match {
    case st: StructType =>
      struct(st.fields.toSeq.map { f =>
        val renamed =
          if (f.name == ValueTag) "#text"
          else if (f.name.startsWith(AttrPrefix)) "@" + f.name.stripPrefix(AttrPrefix)
          else f.name
        xmlJsonShape(f.dataType, c.getField(f.name)).as(renamed)
      }: _*)
    case ArrayType(et, _) => transform(c, x => xmlJsonShape(et, x))
    case _                => c
  }

  /** K6 converter surface: one JSON string per row element, `@`/`#text`
    * conventions applied at every depth. */
  def xmlToJson(df: DataFrame): DataFrame = {
    val shaped = df.schema.fields.toSeq.map { f =>
      val renamed =
        if (f.name == ValueTag) "#text"
        else if (f.name.startsWith(AttrPrefix)) "@" + f.name.stripPrefix(AttrPrefix)
        else f.name
      xmlJsonShape(f.dataType, col("`" + f.name + "`")).as(renamed)
    }
    df.select(to_json(struct(shaped: _*)).as("json"))
  }
}
