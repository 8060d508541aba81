package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Flatten
import graft.sinks.{CsvSink, Excel, Filenames, JsonSink, XmlSink}
import graft.sources.{CsvSource, HttpFetch, JsonSource, XmlSource}

/** The reference's HTTP endpoints as composed library entry points — a user
  * of the reference maps each route onto one function here:
  *
  *   POST /process_link          -> [[processLink]]        (main.py:2287-2318)
  *   POST /process_file          -> [[processFile]]        (main.py:1776-1822)
  *   POST /convert_csv_to_xml    -> [[processCsvToXml]]    (main.py:1824-1855)
  *   POST /convert_csv_to_json   -> [[processCsvToJson]]   (main.py:797-835)
  *   POST /convert_json_to_csv   -> [[processJsonToCsv]]   (main.py:756-794)
  *   POST /convert_xml_to_json   -> [[processXmlToJson]]   (main.py:838-880)
  *   POST /convert_excel_to_csv  -> [[processExcelToCsv]]  (main.py:717-753)
  *   POST /convert_csv_to_excel  -> [[processCsvToExcel]]  (main.py:622-714)
  *
  * Each is: distributed read -> transform -> sink, with the flagship XML
  * path being read(xml) -> flatten(dialect) -> category join -> prune ->
  * sorted ;/BOM CSV (reference entry point 1, SURVEY.md §3).
  */
object Pipeline {

  /** S1 steps 3-6 of entry point 1: validate, detect (or honor the
    * explicit `targetNode` override), read, flatten. Returns the flat
    * all-string offer table BEFORE export pruning, plus the scrubbed temp
    * copy's path when F8 parse repair rewrote the feed — the DataFrame is
    * LAZY, so the temp must outlive every action on it; callers delete it
    * after their sink write completes. */
  def processXmlDataTracked(spark: SparkSession, path: String,
                            targetNode: String = "auto"): (DataFrame, Option[Path]) = {
    val head = XmlSource.readHead(path)
    XmlSource.validate(head)
    val dialect = targetNode match {
      case "auto"                    => XmlSource.detect(head)
      case "offer"                   => XmlSource.Yml
      case "product"                 => XmlSource.Product
      case "russian"                 => XmlSource.Russian
      case "service"                 => XmlSource.Service
      case other => throw new IllegalArgumentException(s"Unknown target node: $other")
    }
    // F8 parse repair: control bytes, BOM, and bare ampersands are
    // scrubbed into a temp copy (streaming; no-op when the feed is clean)
    val src = XmlSource.scrubbedIfNeeded(path)
    val scrubTmp = if (src == path) None else Some(Paths.get(src))
    val rows = XmlSource.read(spark, src, dialect)
    val flat = dialect match {
      case XmlSource.Yml =>
        val cats = XmlSource.categoryPaths(XmlSource.readCategories(spark, src))
        Flatten.flattenOffers(rows, XmlSource.Yml, Some(cats))
      case XmlSource.Product => Flatten.flattenOffers(rows, XmlSource.Product)
      case XmlSource.Russian => Flatten.flattenRussian(rows)
      case XmlSource.Service => Flatten.flattenService(rows)
    }
    (flat, scrubTmp)
  }

  /** [[processXmlDataTracked]] for callers that keep the DataFrame: any
    * scrubbed temp copy survives until JVM exit (deleteOnExit backstop in
    * XmlSource.scrubbedIfNeeded). */
  def processXmlData(spark: SparkSession, path: String,
                     targetNode: String = "auto"): DataFrame =
    processXmlDataTracked(spark, path, targetNode)._1

  /** Entry point 1 tail: flatten -> prune -> sorted ; CSV with BOM
    * (main.py:1540-1582). Returns the written path. */
  def processXmlFileToCsv(spark: SparkSession, inPath: String, outDir: String,
                          targetNode: String = "auto"): Path = {
    val (flat, scrubTmp) = processXmlDataTracked(spark, inPath, targetNode)
    try {
      val out = Paths.get(outDir, Filenames.csvNameFor(Paths.get(inPath).getFileName.toString))
      Files.createDirectories(out.getParent)
      CsvSink.writeSingleFile(CsvSink.exportColumns(flat), out.toString)
      out
    } finally scrubTmp.foreach(Files.deleteIfExists(_)) // feed-sized temp
  }

  /** Entry point: URL fetch -> XML pipeline (main.py:1586-1741 + 1384). */
  def processLink(spark: SparkSession, url: String, outDir: String,
                  targetNode: String = "auto"): Path = {
    val tmp = HttpFetch.fetchToFile(url)
    try {
      val (flat, scrubTmp) = processXmlDataTracked(spark, tmp.toString, targetNode)
      try {
        val out = Paths.get(outDir, Filenames.csvNameFor(url))
        Files.createDirectories(out.getParent)
        CsvSink.writeSingleFile(CsvSink.exportColumns(flat), out.toString)
        out
      } finally scrubTmp.foreach(Files.deleteIfExists(_))
    } finally Files.deleteIfExists(tmp) // a feed-sized temp per call
  }

  /** POST /process_file dispatch by extension (main.py:1803-1812). */
  def processFile(spark: SparkSession, path: String, outDir: String): Path = {
    val name = Paths.get(path).getFileName.toString.toLowerCase
    if (name.endsWith(".csv")) processCsvToXml(spark, path, outDir)
    else if (name.endsWith(".xlsx") || name.endsWith(".xls"))
      processExcelToCsv(spark, path, outDir)
    else if (name.endsWith(".json")) processJsonToCsv(spark, path, outDir)
    else processXmlFileToCsv(spark, path, outDir)
  }

  def processCsvToXml(spark: SparkSession, csvPath: String, outDir: String,
                      xmlFormat: String = "yandex_market",
                      date: String = ""): Path = {
    val df = CsvSource.read(spark, csvPath)
    val out = Paths.get(outDir, Filenames.xmlNameFor(
      Paths.get(csvPath).getFileName.toString, xmlFormat))
    Files.createDirectories(out.getParent)
    xmlFormat match {
      case "simple"             => XmlSink.writeSimple(df, out.toString)
      case "yandex_market" | "" => XmlSink.writeYandexMarket(df, out.toString, date)
      case other => throw new IllegalArgumentException(s"Unknown XML format: $other")
    }
    out
  }

  def processCsvToJson(spark: SparkSession, csvPath: String, outDir: String,
                       jsonFormat: String = "array",
                       exportedAt: String = ""): Path = {
    val df = CsvSource.read(spark, csvPath)
    val base = Paths.get(csvPath).getFileName.toString.replaceAll("(?i)\\.csv$", "")
    val out = Paths.get(outDir, s"$base.json")
    Files.createDirectories(out.getParent)
    jsonFormat match {
      case "object"       => JsonSink.writeEnvelope(df, out.toString, exportedAt)
      case "array" | ""   => JsonSink.writeArray(df, out.toString)
      case other => throw new IllegalArgumentException(
        s"Unknown JSON format: $other") // fail fast like processCsvToXml
    }
    out
  }

  def processJsonToCsv(spark: SparkSession, jsonPath: String, outDir: String): Path = {
    val df = JsonSource.read(spark, jsonPath)
    val base = Paths.get(jsonPath).getFileName.toString.replaceAll("(?i)\\.json$", "")
    val out = Paths.get(outDir, s"$base.csv")
    Files.createDirectories(out.getParent)
    CsvSink.writeSingleFile(
      df.select(df.columns.sorted.toSeq.map(c =>
        org.apache.spark.sql.functions.col("`" + c + "`").cast("string").as(c)): _*),
      out.toString)
    out
  }

  def processXmlToJson(spark: SparkSession, xmlPath: String, outDir: String,
                       rowTag: String): Path = {
    val df = spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("attributePrefix", XmlSource.AttrPrefix)
      .option("valueTag", XmlSource.ValueTag)
      .load(xmlPath)
    val json = JsonSink.xmlToJson(df)
    val base = Paths.get(xmlPath).getFileName.toString.replaceAll("(?i)\\.xml$", "")
    val out = Paths.get(outDir, s"$base.json")
    Files.createDirectories(out.getParent)
    // stream partition iterators: constant driver memory (collect() would
    // materialize the whole converted dataset in one driver array)
    val w = Files.newBufferedWriter(out, StandardCharsets.UTF_8)
    try {
      w.write("[\n")
      // natural partitioning: toLocalIterator holds ONE partition's rows
      // at a time, so many small partitions = bounded driver memory
      // (coalescing first would concentrate ~dataset/n in each)
      val it = json.toLocalIterator()
      var first = true
      while (it.hasNext) {
        if (!first) w.write(",\n")
        w.write(it.next().getString(0))
        first = false
      }
      w.write("\n]")
    } finally w.close()
    out
  }

  def processExcelToCsv(spark: SparkSession, xlsxPath: String, outDir: String): Path = {
    val df = Excel.readXlsx(spark, xlsxPath)
    val base = Paths.get(xlsxPath).getFileName.toString
      .replaceAll("(?i)\\.xlsx?$", "").replaceAll("(?i)\\.xls$", "")
    val out = Paths.get(outDir, s"$base.csv")
    Files.createDirectories(out.getParent)
    CsvSink.writeSingleFile(df, out.toString)
    out
  }

  def processCsvToExcel(spark: SparkSession, csvPath: String, outDir: String): Path = {
    val df = CsvSource.read(spark, csvPath)
    val base = Paths.get(csvPath).getFileName.toString.replaceAll("(?i)\\.csv$", "")
    val out = Paths.get(outDir, s"$base.xlsx")
    Files.createDirectories(out.getParent)
    Excel.writeXlsx(df, out.toString)
    out
  }
}
