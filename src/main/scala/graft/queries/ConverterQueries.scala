package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Flatten
import graft.sinks.{CsvSink, JsonSink, XmlSink}
import graft.sources.{CsvSource, JsonSource, XmlSource}

/** Converter-surface round-trips registered in the driver gate: each query
  * writes testdata through a graft SINK, reads it back through the matching
  * graft SOURCE (+ flatten for XML), and returns the reconstructed rows —
  * so the full K1/S5, K3/S1, K5/S7 paths are hash-verified against plain
  * DuckDB selects over the original parquet.
  *
  * Values are normalized to strings BEFORE writing (the reference's
  * all-string model); doubles go through DECIMAL(18,2) so both engines
  * print identical text.
  */
object ConverterQueries {

  // per-PROCESS unique dir: a fixed shared path would let two concurrent
  // graft JVMs (verify + bench) read each other's half-written files
  private lazy val rtDir: java.nio.file.Path = {
    val d = Files.createTempDirectory("graft_rt")
    d.toFile.deleteOnExit()
    d
  }

  private def tmpFile(name: String): String = rtDir.resolve(name).toString

  /** Shared oracle for the K8 report gates (q69 text / q70 PDF): the same
    * title + header + first-50-rows line set. */
  private val reportOracle =
    """WITH src AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date
      |  FROM orders ORDER BY o_orderkey LIMIT 50),
      | body AS (
      |  SELECT CAST(row_number() OVER (ORDER BY o_orderkey) + 1 AS BIGINT) AS line_no,
      |         CAST(o_orderkey AS VARCHAR) || ' | ' ||
      |         CAST(o_custkey AS VARCHAR) || ' | ' ||
      |         o_orderstatus || ' | ' || o_orderpriority || ' | ' ||
      |         o_date AS line
      |  FROM src)
      |SELECT line_no, line FROM (
      |  SELECT CAST(0 AS BIGINT) AS line_no,
      |         'Отчет: orders' AS line
      |  UNION ALL
      |  SELECT CAST(1 AS BIGINT),
      |         'o_orderkey | o_custkey | o_orderstatus | o_orderpriority | o_date'
      |  UNION ALL
      |  SELECT line_no, line FROM body)
      |ORDER BY line_no""".stripMargin

  private def reportSource(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables(s, dir, "orders").select(
      $"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_orderpriority",
      to_date($"o_orderdate").cast("string").as("o_date"))
  }

  val all: Seq[Q] = Seq(

    // ----- K1 + S5: CSV sink/source round-trip -----
    Q("q27_csv_roundtrip",
      "write part via the ;/BOM CSV sink, sniff-read it back (K1+S5)",
      Some("""SELECT CAST(p_partkey AS VARCHAR) AS p_partkey, p_name, p_brand,
             |       CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS VARCHAR) AS p_retailprice
             |FROM part ORDER BY CAST(p_partkey AS BIGINT)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val src = Tables(s, dir, "part").orderBy("p_partkey").select(
          $"p_partkey".cast("string").as("p_partkey"),
          $"p_name", $"p_brand",
          $"p_retailprice".cast(DecimalType(18, 2)).cast("string")
            .as("p_retailprice"))
        val path = tmpFile("part.csv")
        CsvSink.writeSingleFile(CsvSink.exportColumns(src), path)
        CsvSource.read(s, path)
          .orderBy($"p_partkey".cast("long"))
      }),

    // ----- K3 + S1: YML sink -> XML source -> flatten round-trip -----
    Q("q28_xml_roundtrip",
      "write orders as a YML feed, read+flatten it back (K3+S1+J1)",
      Some("""SELECT CAST(o_orderkey AS VARCHAR) AS attr_id,
             |       o_orderpriority AS name,
             |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price,
             |       o_orderstatus AS category_path
             |FROM orders ORDER BY CAST(attr_id AS BIGINT)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val src = Tables(s, dir, "orders").orderBy("o_orderkey").select(
          $"o_orderkey".cast("string").as("id"),
          $"o_orderpriority".as("name"),
          $"o_totalprice".cast(DecimalType(18, 2)).cast("string").as("price"),
          $"o_orderstatus".as("category_path"))
        val path = tmpFile("orders_feed.xml")
        XmlSink.writeYandexMarket(src, path, date = "2025-01-01 00:00")
        val cats = XmlSource.categoryPaths(XmlSource.readCategories(s, path))
        Flatten.flattenOffers(XmlSource.read(s, path, XmlSource.Yml),
                              XmlSource.Yml, Some(cats))
          // the XML reader re-infers price as double; renormalize to the
          // written DECIMAL(18,2) text so both engines print "x.y0" alike
          .select($"attr_id", $"name",
                  $"price".cast(DecimalType(18, 2)).cast("string").as("price"),
                  $"category_path")
          .orderBy($"attr_id".cast("long"))
      }),

    // ----- K7 + S6: xlsx sink/source round-trip -----
    Q("q37_xlsx_roundtrip",
      "write supplier as minimal OOXML xlsx, unzip+parse it back (K7+S6)",
      Some("""SELECT CAST(s_suppkey AS VARCHAR) AS s_suppkey, s_name,
             |       CAST(s_nationkey AS VARCHAR) AS s_nationkey
             |FROM supplier ORDER BY CAST(s_suppkey AS BIGINT)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val src = Tables(s, dir, "supplier").orderBy("s_suppkey").select(
          $"s_suppkey".cast("string").as("s_suppkey"),
          $"s_name", $"s_nationkey".cast("string").as("s_nationkey"))
        val path = tmpFile("supplier.xlsx")
        graft.sinks.Excel.writeXlsx(src, path)
        graft.sinks.Excel.readXlsx(s, path)
          .orderBy($"s_suppkey".cast("long"))
      }),

    // ----- K5 + S7: JSON envelope sink/source round-trip -----
    Q("q29_json_roundtrip",
      "write customer as a JSON {data,total,exported_at} envelope, read back (K5+S7)",
      Some("""SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name, c_mktsegment
             |FROM customer ORDER BY CAST(c_custkey AS BIGINT)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val src = Tables(s, dir, "customer").orderBy("c_custkey").select(
          $"c_custkey".cast("string").as("c_custkey"),
          $"c_name", $"c_mktsegment")
        val path = tmpFile("customer.json")
        JsonSink.writeEnvelope(src, path, exportedAt = "2025-01-01T00:00:00")
        JsonSource.read(s, path)
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey".cast("long"))
      }),

    // ----- K8: table-style report (title + header + first-50 rows) -----
    Q("q69_table_report",
      "write the first-50-rows table report (K8, main.py:1056-1118 data " +
        "contract: title, header, rows[:50]) and read the artifact back",
      Some(reportOracle),
      (s, dir) => {
        val src = reportSource(s, dir)
        val path = tmpFile("orders_report.txt")
        graft.sinks.Reports.writeTableReport(
          src, orderCol = "o_orderkey", title = "orders", path = path)
        graft.sinks.Reports.readTableReport(s, path).orderBy("line_no")
      }),

    // ----- K8 PDF artifact + S8 PDF text extraction round-trip -----
    Q("q70_pdf_roundtrip",
      "write the K8 report as a REAL multi-page PDF (minimal PDF 1.4 " +
        "writer) and parse the text back distributed via binaryFile + " +
        "partition-wise content-stream decode (S8)",
      Some(reportOracle),
      (s, dir) => {
        val src = reportSource(s, dir)
        val path = tmpFile("orders_report.pdf")
        // 20 lines/page forces pagination: 52 report lines -> 3 pages
        graft.sinks.PdfSink.writeTableReportPdf(
          src, orderCol = "o_orderkey", title = "orders", path = path,
          maxRows = 50, linesPerPage = 20)
        graft.sources.PdfSource.readTextRows(s, path)
          .select(
            ((col("page") - 1) * 20 + col("line_no") - 1).cast("long")
              .as("line_no"),
            col("text").as("line"))
          .orderBy("line_no")
      }),

    // ----- S8 column-structured table extraction from a grid PDF -----
    Q("q98_pdf_table_cells",
      "write nation as a POSITIONED table-grid PDF (absolute Tm per " +
        "cell) and recover (page, table, row, col, cell) structure via " +
        "x/y coordinate clustering — the pdfplumber-class S8 layout " +
        "semantics; 10 rows/page forces 3 pages",
      Some("""WITH src AS (
             |  SELECT n_nationkey, n_name, n_regionkey,
             |         row_number() OVER (ORDER BY n_nationkey) + 1 AS gr
             |  FROM nation),
             |cells AS (
             |  SELECT CAST(1 AS BIGINT) AS gr, 1 AS col, 'n_nationkey' AS cell
             |  UNION ALL SELECT 1, 2, 'n_name'
             |  UNION ALL SELECT 1, 3, 'n_regionkey'
             |  UNION ALL SELECT gr, 1, CAST(n_nationkey AS VARCHAR) FROM src
             |  UNION ALL SELECT gr, 2, n_name FROM src
             |  UNION ALL SELECT gr, 3, CAST(n_regionkey AS VARCHAR) FROM src)
             |SELECT CAST((gr - 1) // 10 + 1 AS INT) AS page,
             |       CAST(1 AS INT) AS "table",
             |       CAST((gr - 1) % 10 + 1 AS INT) AS "row",
             |       CAST(col AS INT) AS col, cell
             |FROM cells ORDER BY page, "row", col""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val src = Tables(s, dir, "nation")
          .select($"n_nationkey", $"n_name", $"n_regionkey")
        val path = tmpFile("nation_grid.pdf")
        graft.sinks.PdfSink.writeTableGridPdf(src, orderCol = "n_nationkey",
          path = path, maxRows = 50, rowsPerPage = 10)
        graft.sources.PdfSource.readTableCells(s, path)
          .select($"page", $"table", $"row", $"col", $"cell")
          .orderBy("page", "row", "col")
      }),

    // ----- ORC format round-trip -----
    Q("q138_orc_roundtrip",
      "write documents through the native ORC sink and read them back — " +
        "the second splittable columnar interchange format (Hive-side " +
        "pipelines); text fidelity proven by md5, schema by the typed " +
        "columns. ORC scans push filters and prune columns like parquet " +
        "(FormatsSpec asserts the pushdown)",
      Some("""SELECT doc_id, lang, source,
             |       CAST(n_chars AS BIGINT) AS n_chars,
             |       md5(text) AS text_md5
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val path = tmpFile("documents_orc")
        Tables(s, dir, "documents")
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .select($"doc_id", $"lang", $"source",
            $"n_chars".cast("long").as("n_chars"),
            md5($"text").as("text_md5"))
          .orderBy("doc_id")
      }),

    // ----- gzipped JSON-Lines round-trip -----
    Q("q140_jsonl_gz_roundtrip",
      "write documents as gzip-compressed JSON-Lines (one object per " +
        "line — the standard LLM corpus interchange format: The Pile / " +
        "C4 / RedPajama all ship as jsonl.gz) and read them back with an " +
        "explicit schema; text fidelity proven by md5 after the full " +
        "JSON escape/unescape cycle. gzip is NOT splittable — one file " +
        "= one read task — so corpora must ship as many part files " +
        "(Spark parallelizes across files; the writer here emits one " +
        "part per input partition)",
      Some("""SELECT doc_id, lang, source,
             |       CAST(n_chars AS BIGINT) AS n_chars,
             |       md5(text) AS text_md5
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val path = tmpFile("documents_jsonl_gz")
        Tables(s, dir, "documents")
          .write.mode("overwrite").option("compression", "gzip").json(path)
        s.read
          .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
            "n_chars LONG")
          .json(path)
          .select($"doc_id", $"lang", $"source",
            $"n_chars".cast("long").as("n_chars"),
            md5($"text").as("text_md5"))
          .orderBy("doc_id")
      }),

    // ----- fixed-width text round-trip -----
    Q("q226_fixedwidth_roundtrip",
      "write part as fixed-width text (the COBOL-copybook/legacy-ETL " +
        "interchange: fixed CHARACTER spans, no delimiters, nulls as " +
        "spaces), read it back by position + rtrim — both directions " +
        "pure map-side column expressions over distributed text parts, " +
        "no driver single-file bottleneck",
      Some("""SELECT CAST(p_partkey AS VARCHAR) AS p_partkey, p_name,
             |       p_brand, CAST(p_size AS VARCHAR) AS p_size
             |FROM part ORDER BY CAST(p_partkey AS BIGINT)""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val widths = Seq("p_partkey" -> 12, "p_name" -> 80,
          "p_brand" -> 12, "p_size" -> 8)
        val path = tmpFile("part_fixedwidth")
        graft.sources.FixedWidth.write(Tables(s, dir, "part"), widths, path)
        graft.sources.FixedWidth.read(s, path, widths)
          .orderBy($"p_partkey".cast("long"))
      })
  )
}
