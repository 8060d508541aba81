package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestBase

/** End-to-end entry-point tests: the reference's flagship URL/file -> CSV
  * pipeline and the converter triangle, over the FIXTURES.md fixtures. */
class PipelineSpec extends SparkTestBase {

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
  private def outDir(): String =
    Files.createTempDirectory("graftpipe").toString

  test("flagship: YML fixture -> flatten -> prune -> ;/BOM CSV (golden)") {
    val out = Pipeline.processXmlFileToCsv(spark, fixture("yml_offer.xml"), outDir())
    val text = new String(Files.readAllBytes(out), StandardCharsets.UTF_8)
    assert(text.startsWith("﻿")) // utf-8-sig BOM
    val expected = new String(Files.readAllBytes(
      Paths.get(getClass.getResource("/fixtures/yml_offer_expected.csv").getPath)),
      StandardCharsets.UTF_8)
    assert(text === expected)
  }

  test("a dirty feed's scrubbed temp copy is deleted once the CSV is " +
       "written (no feed-sized /tmp leak per conversion)") {
    val dirty = "<yml_catalog><shop><offers>" +
      "<offer id=\"1\"><name>A & B</name><price>10</price></offer>" +
      "</offers></shop></yml_catalog>"
    val dir = Files.createTempDirectory("graft_scrub_leak")
    val src = dir.resolve("dirty_feed.xml")
    Files.writeString(src, dirty)
    def scrubTemps() = {
      val l = Files.list(Paths.get(System.getProperty("java.io.tmpdir")))
      try l.iterator().asScala
        .count(_.getFileName.toString.startsWith("graft_scrub")) finally l.close()
    }
    val before = scrubTemps()
    val out = Pipeline.processXmlFileToCsv(spark, src.toString, outDir())
    assert(Files.size(out) > 0)
    assert(scrubTemps() === before, "scrubbed temp copy must be deleted")
  }

  test("processFile dispatches by extension (xml -> csv)") {
    val out = Pipeline.processFile(spark, fixture("russian_1c.xml"), outDir())
    val lines = new String(Files.readAllBytes(out), StandardCharsets.UTF_8)
      .stripPrefix("﻿").split("\r\n")
    assert(lines.head.split(";").contains("name"))
    assert(lines(1).contains("Диван \"\"Тест\"\"") || lines(1).contains("Диван"))
  }

  test("converter triangle: csv -> xml -> (read back), csv -> json -> csv") {
    val dir = outDir()
    // build a small csv via the flagship path
    val csv = Pipeline.processXmlFileToCsv(spark, fixture("yml_offer.xml"), dir)
    val xml = Pipeline.processCsvToXml(spark, csv.toString, dir,
      xmlFormat = "yandex_market", date = "2025-01-01 00:00")
    assert(Files.readString(xml).contains("<yml_catalog date=\"2025-01-01 00:00\">"))
    val json = Pipeline.processCsvToJson(spark, csv.toString, dir)
    assert(Files.readString(json).trim.startsWith("["))
    val backCsv = Pipeline.processJsonToCsv(spark, json.toString, dir)
    assert(Files.readString(backCsv).contains("category_path"))
  }

  test("excel leg: csv -> xlsx -> csv") {
    val dir = outDir()
    val csv = Pipeline.processXmlFileToCsv(spark, fixture("yml_offer.xml"), dir)
    val xlsx = Pipeline.processCsvToExcel(spark, csv.toString, dir)
    val back = Pipeline.processExcelToCsv(spark, xlsx.toString, dir)
    val a = Files.readString(csv).stripPrefix("﻿").split("\r\n").head
    val b = Files.readString(back).stripPrefix("﻿").split("\r\n").head
    assert(a === b) // identical sorted headers survive the xlsx round trip
  }

  test("xml -> json conversion keeps @attr/#text conventions") {
    val dir = outDir()
    val out = Pipeline.processXmlToJson(spark, fixture("service.xml"), dir, "service")
    val text = Files.readString(out)
    assert(text.contains("\"@id\":\"svc-1\""))
    assert(text.contains("\"@currency\":\"RUR\""))
  }

  test("processLink fires the completion webhook with the CSV path " +
       "(live server), and a dead callback never fails the conversion") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    val feed = Files.readString(Paths.get(fixture("yml_offer.xml")))
    val captured = new java.util.concurrent.atomic.AtomicReference[String](null)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed.xml", (ex: HttpExchange) => {
      val b = feed.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/xml")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.createContext("/done", (ex: HttpExchange) => {
      captured.set(new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val dir = outDir()
      val out = Pipeline.processLink(spark, s"$base/feed.xml", dir,
        returnUrl = Some(s"$base/done"))
      assert(Files.size(out) > 0)
      val body = captured.get()
      assert(body != null, "webhook must have fired")
      assert(body.contains("\"status\": \"completed\""))
      assert(body.contains(out.toString))
      assert(body.contains("\"preset_id\": \"auto\""))
      // dead callback endpoint: conversion still succeeds
      val out2 = Pipeline.processLink(spark, s"$base/feed.xml", dir,
        returnUrl = Some(s"http://127.0.0.1:1/nope"))
      assert(Files.size(out2) > 0)
    } finally server.stop(0)
  }

  // --- PDF / image converter endpoints (reference main.py:2050-2285) ---

  private def writeCsv(dir: String, name: String, rows: Seq[Seq[String]]): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, rows.map(_.mkString(";")).mkString("\r\n"))
    p.toString
  }

  test("csv -> grid pdf -> csv recovers header, values, and provenance " +
       "columns (pdf table extraction round trip)") {
    val dir = outDir()
    val csv = writeCsv(dir, "inv.csv", Seq(
      Seq("sku", "qty", "price"),
      Seq("a-1", "3", "10.50"),
      Seq("b-2", "7", "2.00"),
      Seq("c-3", "1", "99.99")))
    val pdf = Pipeline.processCsvToPdf(spark, csv, dir)
    assert(Files.readString(pdf, StandardCharsets.ISO_8859_1).startsWith("%PDF"))
    val back = Pipeline.processPdfToCsv(spark, pdf.toString, dir)
    val lines = Files.readString(back).stripPrefix("﻿").split("\r\n")
    assert(lines.head === "sku;qty;price;pdf_page;table_number")
    assert(lines.toSeq.tail === Seq(
      "a-1;3;10.50;1;1", "b-2;7;2.00;1;1", "c-3;1;99.99;1;1"))
  }

  test("pdf -> excel routes the extracted tables into a readable workbook") {
    val dir = outDir()
    val csv = writeCsv(dir, "inv.csv", Seq(
      Seq("sku", "qty"), Seq("a-1", "3"), Seq("b-2", "7")))
    val pdf = Pipeline.processCsvToPdf(spark, csv, dir)
    val xlsx = Pipeline.processPdfToExcel(spark, pdf.toString, dir)
    val df = graft.sinks.Excel.readXlsx(spark, xlsx.toString)
    assert(df.columns.toSeq === Seq("sku", "qty", "pdf_page", "table_number"))
    assert(df.count() === 2)
    assert(!Files.exists(Paths.get(dir, "inv_report_tables.csv")),
      "intermediate CSV must be deleted")
  }

  test("csv -> summary-style pdf reports counts, fields, and examples") {
    val dir = outDir()
    val csv = writeCsv(dir, "inv.csv", Seq(
      Seq("sku", "qty"), Seq("a-1", "3"), Seq("b-2", "7"), Seq("c-3", "1")))
    val pdf = Pipeline.processCsvToPdf(spark, csv, dir, reportStyle = "summary")
    val lines = graft.sources.PdfSource
      .extractLines(Files.readAllBytes(pdf)).map(_._3)
    assert(lines.contains("  - records: 3"))
    assert(lines.contains("  - fields: 2"))
    assert(lines.contains("  - field names: sku, qty"))
    assert(lines.contains("  - sku: a-1"))
    intercept[IllegalArgumentException] {
      Pipeline.processCsvToPdf(spark, csv, dir, reportStyle = "bogus")
    }
  }

  test("excel -> pdf report renders the workbook's table") {
    val dir = outDir()
    val csv = writeCsv(dir, "inv.csv", Seq(
      Seq("sku", "qty"), Seq("a-1", "3"), Seq("b-2", "7")))
    val xlsx = Pipeline.processCsvToExcel(spark, csv, dir)
    val pdf = Pipeline.processExcelToPdf(spark, xlsx.toString, dir)
    val cells = graft.sources.PdfSource
      .readTableCells(spark, pdf.toString).collect()
    assert(cells.exists(_.getAs[String]("cell") == "sku"))
    assert(cells.exists(_.getAs[String]("cell") == "b-2"))
  }

  test("pdf table header edges: duplicate names get occurrence " +
       "suffixes, '_'-prefixed headers survive, headerless columns " +
       "keep their data under col_N") {
    val dir = outDir()
    val dup = Paths.get(dir, "dup.pdf")
    graft.sinks.PdfSink.writeGridPdf(
      Seq(Seq("v", "v"), Seq("1", "2")), dup.toString)
    val dupCsv = Pipeline.processPdfToCsv(spark, dup.toString, dir)
    val dupLines = Files.readString(dupCsv).stripPrefix("﻿").split("\r\n")
    assert(dupLines.head === "v;v_2;pdf_page;table_number")
    assert(dupLines(1) === "1;2;1;1") // both columns' data kept

    val und = Paths.get(dir, "und.pdf")
    graft.sinks.PdfSink.writeGridPdf(
      Seq(Seq("_id", "x"), Seq("7", "8")), und.toString)
    val undCsv = Pipeline.processPdfToCsv(spark, und.toString, dir)
    val undLines = Files.readString(undCsv).stripPrefix("﻿").split("\r\n")
    assert(undLines.head === "_id;x;pdf_page;table_number")
    assert(undLines(1) === "7;8;1;1")

    val nohdr = Paths.get(dir, "nohdr.pdf")
    graft.sinks.PdfSink.writeGridPdf(
      Seq(Seq("a", "b"), Seq("1", "2", "3")), nohdr.toString)
    val nhCsv = Pipeline.processPdfToCsv(spark, nohdr.toString, dir)
    val nhLines = Files.readString(nhCsv).stripPrefix("﻿").split("\r\n")
    assert(nhLines.head === "a;b;col_3;pdf_page;table_number")
    assert(nhLines(1) === "1;2;3;1;1") // headerless column's data kept
  }

  test("pdf -> json on a mixed image+text document: the table lands on " +
       "the unified page number, not the text-stream index") {
    val dir = outDir()
    // page 1 = image placement only (no BT); page 2 = a 2x2 text table.
    // readTableCells numbers the text page 1 (text-stream scale) while
    // the unified walk numbers it 2 — the JSON must say page 2.
    val mixed =
      "%PDF-1.4\n" +
      "1 0 obj << >>\nstream\nq 10 0 0 10 50 700 cm /Im0 Do Q\nendstream\nendobj\n" +
      "2 0 obj << >>\nstream\nBT\n/F1 10 Tf\n" +
      "1 0 0 1 50 778 Tm (h1) Tj\n1 0 0 1 160 778 Tm (h2) Tj\n" +
      "1 0 0 1 50 764 Tm (v1) Tj\n1 0 0 1 160 764 Tm (v2) Tj\n" +
      "ET\nendstream\nendobj\n%%EOF"
    val pdf = Paths.get(dir, "mixed.pdf")
    Files.write(pdf, mixed.getBytes(StandardCharsets.ISO_8859_1))
    val json = Pipeline.processPdfToJson(spark, pdf.toString, dir)
    val df = spark.read.option("multiLine", "true").json(json.toString)
    val row = df.collect().head
    val info = row.getAs[org.apache.spark.sql.Row]("document_info")
    assert(info.getAs[Long]("pages_count") === 2L)
    val tables = row.getSeq[org.apache.spark.sql.Row](
      df.schema.fieldIndex("tables"))
    assert(tables.length === 1)
    assert(tables.head.getAs[Long]("page") === 2L)
    val pages = row.getSeq[org.apache.spark.sql.Row](
      df.schema.fieldIndex("pages"))
    assert(pages.head.getAs[Long]("images_count") === 1L)
    assert(pages.head.getSeq[org.apache.spark.sql.Row](
      pages.head.schema.fieldIndex("tables")).isEmpty)
    assert(pages(1).getSeq[org.apache.spark.sql.Row](
      pages(1).schema.fieldIndex("tables")).length === 1)
  }

  test("pdf -> json carries pages, tables, text_content, and counts " +
       "(valid JSON by Spark's own reader)") {
    val dir = outDir()
    val csv = writeCsv(dir, "inv.csv", Seq(
      Seq("sku", "qty"), Seq("a-1", "3"), Seq("b-2", "7")))
    val pdf = Pipeline.processCsvToPdf(spark, csv, dir)
    val json = Pipeline.processPdfToJson(spark, pdf.toString, dir)
    assert(json.getFileName.toString === "inv_report_data.json")
    val df = spark.read.option("multiLine", "true").json(json.toString)
    val row = df.collect().head
    val info = row.getAs[org.apache.spark.sql.Row]("document_info")
    assert(info.getAs[Long]("pages_count") === 1L)
    val tables = row.getSeq[org.apache.spark.sql.Row](
      df.schema.fieldIndex("tables"))
    assert(tables.length === 1)
    assert(tables.head.getAs[Seq[String]]("headers") === Seq("sku", "qty"))
    assert(tables.head.getAs[Long]("rows_count") === 2L)
    assert(tables.head.getAs[Long]("columns_count") === 2L)
    val pages = row.getSeq[org.apache.spark.sql.Row](
      df.schema.fieldIndex("pages"))
    assert(pages.head.getAs[String]("text").contains("a-1"))
  }

  test("image -> pdf -> image: JPEG embeds byte-for-byte (DCTDecode " +
       "passthrough) and a single page rasterizes back to one png") {
    val dir = outDir()
    // a tiny raster, JPEG-encoded via the K9 codec
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, ((x * 32) << 16) | ((y * 42) << 8) | 128)
    val jpg = graft.analytics.Multimodal.encodeImage(img, "jpg")
    val src = Paths.get(dir, "pic.jpg")
    Files.write(src, jpg)
    val pdf = Pipeline.processImageToPdf(src.toString, dir)
    assert(pdf.getFileName.toString === "pic.pdf")
    val embedded = graft.sources.PdfSource
      .extractImages(Files.readAllBytes(pdf))
    assert(embedded.length === 1)
    assert(embedded.head._5.toSeq === jpg.toSeq) // lossless passthrough
    val png = Pipeline.processPdfToImages(pdf.toString, dir, format = "png")
    assert(png.getFileName.toString === "pic.png")
    assert(graft.analytics.Multimodal.decodeImage(
      Files.readAllBytes(png)).isDefined)
  }

  test("multi-page pdf -> images lands a zip with page_NNN entries") {
    val dir = outDir()
    val lines = (1 to 120).map(i => s"line $i") // > 55 lines = 3 pages
    val pdf = Paths.get(dir, "long.pdf")
    graft.sinks.PdfSink.writeTextPdf(lines, pdf.toString)
    val zip = Pipeline.processPdfToImages(pdf.toString, dir, format = "jpg")
    assert(zip.getFileName.toString === "long_images.zip")
    val zf = new java.util.zip.ZipFile(zip.toFile)
    try {
      val names = zf.entries().asScala.map(_.getName).toSeq.sorted
      assert(names === Seq("page_001.jpg", "page_002.jpg", "page_003.jpg"))
    } finally zf.close()
  }

  test("png -> jpg re-encode flattens alpha onto white (the JDK JPEG " +
       "writer rejects ARGB, so the flatten is load-bearing)") {
    val dir = outDir()
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x00000000 else 0xff112233) // left half transparent
    val src = Paths.get(dir, "logo.png")
    Files.write(src, graft.analytics.Multimodal.encodeImage(img, "png"))
    val jpg = Pipeline.processPngToJpg(src.toString, dir)
    assert(jpg.getFileName.toString === "logo.jpg")
    val back = graft.analytics.Multimodal.decodeImage(Files.readAllBytes(jpg)).get
    assert(back.getWidth === 4 && back.getHeight === 4)
    // transparent pixels composited onto white (allow JPEG quantization slack)
    val p = back.getRGB(0, 0)
    assert(((p >> 16) & 0xff) > 200 && ((p >> 8) & 0xff) > 200 && (p & 0xff) > 200,
      f"expected near-white, got 0x$p%08x")
  }

  test("jpg -> png re-encode keeps pixels decodable and sizes intact") {
    val dir = outDir()
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, 0x336699)
    val src = Paths.get(dir, "photo.jpeg")
    Files.write(src, graft.analytics.Multimodal.encodeImage(img, "jpg"))
    val png = Pipeline.processJpgToPng(src.toString, dir)
    assert(png.getFileName.toString === "photo.png")
    val back = graft.analytics.Multimodal.decodeImage(Files.readAllBytes(png))
    assert(back.exists(b => b.getWidth == 5 && b.getHeight == 4))
  }
}
