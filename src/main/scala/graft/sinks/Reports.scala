package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K8 — the table-style report (reference main.py:1056-1118): title line,
  * header row, and the first `maxRows` data rows. The reportlab PDF styling
  * (grid, colors, Helvetica) is presentation, not data; what this
  * reproduces deterministically is the report's DATA contract — the
  * "Отчет: {name}" title (main.py:1093), the header list from the row keys
  * (main.py:1098), the rows[:50] cap (main.py:1101), and the
  * str(row.get(header, '')) cell rendering (main.py:1102) — as a plain
  * UTF-8 text artifact any PDF layout engine could typeset downstream.
  */
object Reports {

  /** The report contents as (line_no, line) rows: 0 = title, 1 = header,
    * 2.. = the first `maxRows` rows of `df` ordered by `orderCol`, cells
    * joined " | " with nulls rendered '' (the reference's
    * `row.get(header, '')`). Ties on `orderCol` break on the rendered
    * line itself, so both the cap cut and the numbering are deterministic
    * for ANY input — a bare orderBy(orderCol) would pick and order tied
    * rows arbitrarily. The `limit` runs BEFORE the only global window, so
    * the window sorts `maxRows` rows, never the corpus — the same
    * tiny-cap shape as T3/T4. */
  def tableReportLines(df: DataFrame, orderCol: String, title: String,
                       maxRows: Int = 50): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val cells = cols.map(n =>
      coalesce(col("`" + n + "`").cast("string"), lit("")))
    val rendered = df.select(col("`" + orderCol + "`").as("_ord"),
                             concat_ws(" | ", cells: _*).as("line"))
    val limited = rendered.orderBy($"_ord", $"line").limit(maxRows)
    val body = limited.select(
      (row_number().over(Window.orderBy($"_ord", $"line")) + 1).cast("long")
        .as("line_no"),
      $"line")
    Seq((0L, s"Отчет: $title"), (1L, cols.mkString(" | ")))
      .toDF("line_no", "line")
      .unionByName(body)
  }

  /** Write the report as a single UTF-8 text file. The collect is
    * report-sized by construction (maxRows + 2 lines), not corpus-sized. */
  def writeTableReport(df: DataFrame, orderCol: String, title: String,
                       path: String, maxRows: Int = 50): Unit = {
    val lines = tableReportLines(df, orderCol, title, maxRows)
      .orderBy("line_no").select("line").collect().map(_.getString(0))
    Files.write(Paths.get(path),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Read a written report back as (line_no, line) — driver-side read; the
    * artifact is report-sized by construction. */
  def readTableReport(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala
      .toSeq.zipWithIndex
      .map { case (l, i) => (i.toLong, l) }
      .toDF("line_no", "line")
  }
}
