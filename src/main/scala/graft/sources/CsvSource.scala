package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5 — CSV source with delimiter sniffing (reference `process_csv_to_xml`
  * main.py:504-519 and `process_csv_to_excel` main.py:631-649).
  *
  * The sniff is a driver-side head-line probe (the reference counts `,` vs
  * `;` on the first line, falling back to trying `;`/`,`/tab until a read
  * yields more than one column); the read itself is the distributed Spark
  * CSV source, all columns string-typed (the reference's data model).
  */
object CsvSource {

  /** Reference sniff (main.py:513-516): `,` wins only if strictly more
    * frequent than `;` on the first line. */
  def sniffDelimiter(firstLine: String): String =
    if (firstLine.count(_ == ',') > firstLine.count(_ == ';')) "," else ";"

  def sniffFile(path: String): String = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try sniffDelimiter(src.getLines().nextOption().getOrElse(""))
    finally src.close()
  }

  /** Distributed header'd read, all-string schema, BOM-tolerant.
    * escape=`"` matches the RFC-4180 `""` doubling our sinks (and the
    * reference's csv module) write — Spark's default escape is `\`, which
    * would corrupt quoted cells on read-back.
    *
    * `multiLine=true` parses embedded newlines inside quoted cells (the
    * reference's csv.DictReader does this by default) at the cost of
    * splittability — one core per FILE. Default false: the scale path, and
    * our own sinks scrub newlines to spaces on export (F6) so engine
    * round-trips never need it. Enable it for foreign CSVs with multiline
    * cells. */
  def read(spark: SparkSession, path: String,
           delimiter: Option[String] = None,
           multiLine: Boolean = false): DataFrame = {
    val sep = delimiter.getOrElse(sniffFile(path))
    def readWith(s: String): DataFrame = spark.read
      .option("header", "true")
      .option("sep", s)
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .option("inferSchema", "false")
      .csv(path)
    val df = readWith(sep)
    // fallback chain (main.py:631-649): a 1-column parse means the
    // delimiter was wrong — try the alternatives
    if (df.columns.length > 1) df
    else Seq(";", ",", "\t").filterNot(_ == sep).iterator
      .map(readWith)
      .find(_.columns.length > 1)
      .getOrElse(df)
  }
}
