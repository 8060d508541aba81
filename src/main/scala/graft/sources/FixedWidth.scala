package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width text source/sink — the mainframe/legacy-ETL interchange
  * format (COBOL copybooks, bank statements, census extracts): every
  * field occupies a fixed CHARACTER span, no delimiters, no quoting.
  * Write pads-or-truncates each cell to its declared width; read slices
  * by position and right-trims the padding.
  *
  * Contract notes (all deliberate):
  *  - widths are CHARACTERS, not bytes (`substring`/`rpad` are
  *    codepoint-based on both the write and read side, so non-ASCII
  *    text round-trips as long as it fits);
  *  - a value longer than its width TRUNCATES (the format has no
  *    escape hatch — size widths to the domain);
  *  - trailing spaces inside a value are indistinguishable from
  *    padding and do not survive (rtrim on read);
  *  - nulls write as all-spaces and read back as empty strings
  *    (fixed-width carries no null marker).
  *
  * Scale shape: both directions are pure map-side column expressions
  * over distributed text parts — one codegen'd concat per row out, one
  * substring per field in; no driver involvement, no single-file
  * bottleneck. */
object FixedWidth {

  /** Write `df` as fixed-width text parts under `dir`. Fields emit in
    * `widths` order; every cell is `rpad(substring(cast(c as string),
    * 1, w), w, ' ')`. */
  def write(df: DataFrame, widths: Seq[(String, Int)], dir: String): Unit = {
    require(widths.nonEmpty && widths.forall(_._2 >= 1),
      "need at least one field, widths >= 1")
    val line = concat(widths.map { case (name, w) =>
      rpad(substring(coalesce(col(name).cast("string"), lit("")), 1, w),
        w, " ")
    }: _*).as("value")
    df.select(line).write.mode("overwrite").text(dir)
  }

  /** Read fixed-width text parts back into (all-string) columns. */
  def read(spark: SparkSession, dir: String,
           widths: Seq[(String, Int)]): DataFrame = {
    require(widths.nonEmpty && widths.forall(_._2 >= 1),
      "need at least one field, widths >= 1")
    val raw = spark.read.text(dir)
    val starts = widths.scanLeft(1) { case (acc, (_, w)) => acc + w }
    raw.select(widths.zip(starts).map { case ((name, w), start) =>
      rtrim(substring(col("value"), start, w)).as(name)
    }: _*)
  }
}
