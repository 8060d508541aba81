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
}
