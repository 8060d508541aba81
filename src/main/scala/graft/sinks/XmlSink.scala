package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K3/K4 — XML sinks (reference `process_csv_to_xml` main.py:524-599):
  * `yandex_market` (yml_catalog/shop envelope, re-derived category
  * dictionary with dense first-occurrence ids, `picture` per `///` item,
  * `param` per `param_*` column) and `simple` (catalog/products with
  * nested images/parameters groups).
  *
  * Row elements are built as pure Column string expressions — the per-offer
  * serialization is distributed and codegen'd; only the envelope (a few
  * dozen bytes plus the tiny category dictionary) is driver-side. The
  * single-file writer streams partition iterators, never materializing the
  * dataset. At scale, `elementStrings` + `df.write.text` gives envelope-
  * free part files to be framed by a downstream concatenation.
  */
object XmlSink {

  /** XML text escaping (ET.tostring semantics: `& < >` in text, plus quotes
    * for attribute values) via the single-pass codegen'd
    * [[graft.functions.XmlEscape]] kernel — the chained-`replace` form
    * walked and re-allocated every field 3-4 times per row. */
  def escText(c: Column): Column = graft.functions.XmlEscape.escapeText(c)

  def escAttr(c: Column): Column = graft.functions.XmlEscape.escapeAttr(c)

  private def nonEmpty(c: Column): Column = c.isNotNull && c =!= ""

  /** Attribute-value escaping for DRIVER-side strings (param names are
    * plan-time constants derived from feed column names). */
  private def escAttrStr(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Optional child element line at the given indent. */
  private def elem(tag: String, v: Column, indent: String,
                   attrs: Column = lit("")): Column =
    when(nonEmpty(v),
      concat(lit(s"\n$indent<$tag"), attrs, lit(">"), escText(v),
             lit(s"</$tag>"))).otherwise(lit(""))

  /** First-occurrence dense-id category dictionary (J3/A7/T7,
    * main.py:535-547): category_path -> 1-based id in row order. */
  def categoryDictionary(df: DataFrame): DataFrame = {
    if (!df.columns.contains("category_path")) {
      // typed empty dictionary: downstream still selects/sorts these columns
      val spark = df.sparkSession
      import spark.implicits._
      return Seq.empty[(String, String)].toDF("category_path", "cat_id")
    }
    val w = Window.orderBy(col("first_seen"))
    df.select(col("category_path"), monotonically_increasing_id().as("__idx"))
      .filter(nonEmpty(col("category_path")))
      .groupBy("category_path")
      .agg(min(col("__idx")).as("first_seen"))
      .withColumn("cat_id", row_number().over(w).cast("string"))
      .drop("first_seen")
  }

  /** Per-row `<offer>` element strings (yandex_market layout,
    * main.py:549-574), distributed + codegen'd. */
  def offerElements(df: DataFrame, catDict: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    val ind  = "      " // depth 3 under yml_catalog/shop/offers
    val ind2 = "        "

    def colOr(n: String): Column =
      if (cols.contains(n)) trim(col("`" + n + "`").cast("string"))
      else lit(null).cast("string")

    // the 1-based row-number fallback for missing ids needs a GLOBAL window
    // (single-partition sort) — only pay for it when no id column exists
    val needRowno = !cols.contains("id")
    val withId =
      if (needRowno)
        df.withColumn("__rowno",
          row_number().over(Window.orderBy(monotonically_increasing_id()))
            .cast("string"))
      else df.withColumn("__rowno", lit(null).cast("string"))
    val idCol =
      if (cols.contains("id")) coalesce(colOr("id"), col("__rowno"))
      else col("__rowno")

    val availAttr =
      if (cols.contains("available"))
        when(nonEmpty(colOr("available")),
             concat(lit(" available=\""), escAttr(colOr("available")), lit("\"")))
          .otherwise(lit(""))
      else lit("")

    val basicFields = Seq("name", "price", "oldprice", "currencyId",
                          "vendorCode", "vendor", "description")
    val basics = basicFields.filter(cols.contains)
      .map(f => elem(f, colOr(f), ind2))

    val catId = if (cols.contains("category_path")) {
      val joined = col("cat_id")
      elem("categoryId", joined, ind2)
    } else lit("")

    val pictures =
      if (cols.contains("pictures"))
        coalesce(
          array_join(
            filter(
              transform(split(coalesce(colOr("pictures"), lit("")), "///"),
                        p => when(trim(p) =!= "",
                          concat(lit(s"\n$ind2<picture>"), escText(trim(p)),
                                 lit("</picture>"))).otherwise(lit(""))),
              s => s =!= ""),
            ""),
          lit(""))
      else lit("")

    val params = df.columns.filter(_.startsWith("param_")).sorted.toSeq.map { k =>
      val nm = escAttrStr(k.stripPrefix("param_"))
      when(nonEmpty(colOr(k)),
        concat(lit(s"""\n$ind2<param name="$nm">"""), escText(colOr(k)),
               lit("</param>"))).otherwise(lit(""))
    }

    val body = (basics :+ catId :+ pictures) ++ params
    val joined =
      if (cols.contains("category_path"))
        withId.join(broadcast(catDict), Seq("category_path"), "left")
      else withId
    joined.select(
      concat(
        (Seq(lit(s"\n$ind<offer id=\""), escAttr(coalesce(idCol, lit(""))),
             lit("\""), availAttr,
             lit(">")) ++ body :+ lit(s"\n$ind</offer>")): _*).as("xml"))
  }

  /** Drain element strings into an open byte stream: the per-row
    * serialization runs DISTRIBUTED (text part files across all cores), the
    * driver only concatenates part bytes. Each element carries a leading
    * `\n`; the text writer instead appends a trailing newline per row, so
    * stripping the lead char keeps the concatenated bytes identical to the
    * old serialized toLocalIterator drain (and to the reference layout).
    * Emits "\n" before and nothing after, i.e. the caller writes
    * `<wrapper>` ... `    </wrapper>` around it; with zero rows the single
    * "\n" still matches the old `\n    </wrapper>` framing. */
  private def drainElements(elems: DataFrame, out: java.io.OutputStream): Unit = {
    out.write("\n".getBytes(StandardCharsets.UTF_8))
    PartFiles.drain(elems.select(expr("substring(xml, 2)").as("value")),
                    out, lineSep = "\n")
  }

  /** K3 single-file yandex_market write (envelope main.py:524-547). `date`
    * is injectable for determinism (F12). */
  def writeYandexMarket(df0: DataFrame, path: String,
                        date: String = ""): Unit = {
    // the category-dictionary pass and the offer-serialization pass both
    // evaluate the input; persist so the (possibly sorted/joined) lineage
    // computes once — recomputing a sort costs more than spilling the
    // feed-sized rows, and the block is released before returning. Only
    // persist (and later unpersist) when the CALLER hasn't — unpersisting
    // an input the caller cached would silently destroy their cache.
    val ourPersist = df0.columns.contains("category_path") &&
      df0.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val df =
      if (ourPersist)
        df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df0
    try writeYandexMarketImpl(df, path, date)
    finally if (ourPersist) df.unpersist(false)
  }

  private def writeYandexMarketImpl(df: DataFrame, path: String,
                                    date: String): Unit = {
    val catDict = categoryDictionary(df)
    val cats = catDict.orderBy(col("cat_id").cast("int")).collect()
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(
      Paths.get(path), StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING))
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    try {
      w("<?xml version='1.0' encoding='utf-8'?>\n")
      w(s"""<yml_catalog date="$date">\n  <shop>""")
      w("\n    <name>Generated from CSV</name>")
      w("\n    <company>MagicXML</company>")
      w("\n    <url>https://magic-xml.replit.app</url>")
      w("\n    <currencies>\n      <currency id=\"RUR\" rate=\"1\"/>\n    </currencies>")
      w("\n    <categories>")
      cats.foreach { r =>
        val p = r.getAs[String]("category_path")
        val esc = p.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        w(s"""\n      <category id="${r.getAs[String]("cat_id")}">$esc</category>""")
      }
      w("\n    </categories>\n    <offers>")
      drainElements(offerElements(df, catDict), out)
      w("    </offers>\n  </shop>\n</yml_catalog>")
    } finally out.close()
  }

  /** Per-row `<product>` element strings (simple layout, main.py:576-599). */
  def productElements(df: DataFrame): DataFrame = {
    val ind  = "    "
    val ind2 = "      "
    val ind3 = "        "
    val cols = df.columns.toSeq

    def colOr(n: String): Column = trim(col("`" + n + "`").cast("string"))

    val withId =
      if (!cols.contains("id"))
        df.withColumn("__rowno",
          row_number().over(Window.orderBy(monotonically_increasing_id()))
            .cast("string"))
      else df.withColumn("__rowno", lit(null).cast("string"))
    val idCol =
      if (cols.contains("id")) coalesce(colOr("id"), col("__rowno"))
      else col("__rowno")

    val paramCols = cols.filter(_.startsWith("param_"))
    val params =
      if (paramCols.isEmpty) Seq.empty[Column]
      else {
        val inner = paramCols.map { k =>
          val nm = escAttrStr(k.stripPrefix("param_"))
          when(nonEmpty(colOr(k)),
            concat(lit(s"""\n$ind3<parameter name="$nm">"""), escText(colOr(k)),
                   lit("</parameter>"))).otherwise(lit(""))
        }
        val anyParam = paramCols.map(k => nonEmpty(colOr(k))).reduce(_ || _)
        Seq(when(anyParam,
          concat((lit(s"\n$ind2<parameters>") +: inner :+
                  lit(s"\n$ind2</parameters>")): _*)).otherwise(lit("")))
      }

    val others = cols.filterNot(k => k == "id" || k.startsWith("param_"))
      .map {
        case "pictures" =>
          when(nonEmpty(colOr("pictures")) && colOr("pictures").contains("///"),
            concat(lit(s"\n$ind2<images>"),
              array_join(filter(
                transform(split(colOr("pictures"), "///"),
                  p => when(trim(p) =!= "",
                    concat(lit(s"\n$ind3<image>"), escText(trim(p)),
                           lit("</image>"))).otherwise(lit(""))),
                s => s =!= ""), ""),
              lit(s"\n$ind2</images>")))
            .otherwise(elem("pictures", colOr("pictures"), ind2))
        case k =>
          val cleanTag = k.replace(" ", "_").replace("-", "_")
          elem(cleanTag, colOr(k), ind2)
      }

    withId.select(
      concat(
        (Seq(lit(s"\n$ind<product id=\""), escAttr(coalesce(idCol, lit(""))),
             lit("\">")) ++
          others ++ params :+ lit(s"\n$ind</product>")): _*).as("xml"))
  }

  /** K4 single-file `simple` write (catalog/products envelope). */
  def writeSimple(df: DataFrame, path: String): Unit = {
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(
      Paths.get(path), StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING))
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    try {
      w("<?xml version='1.0' encoding='utf-8'?>\n")
      w("<catalog>\n  <products>")
      drainElements(productElements(df), out)
      w("  </products>\n</catalog>")
    } finally out.close()
  }
}
