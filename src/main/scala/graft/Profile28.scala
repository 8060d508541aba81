package graft

import org.apache.spark.sql.SparkSession

/** Shared wall-clock helper for the manual profiling mains. */
private[graft] object ProfTimer {
  def t[A](tag: String, name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[$tag] $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
}

/** Stage-by-stage wall-clock breakdown of the q28 XML round-trip (manual
  * profiling utility, not run by the driver). */
object Profile28 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, appName = "graft-profile28")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    // warm up
    spark.read.parquet(s"$dir/orders.parquet").count()

    def t[A](name: String)(f: => A): A = ProfTimer.t("p28", name)(f)

    val src = queries.Tables(spark, dir, "orders").orderBy("o_orderkey").select(
      $"o_orderkey".cast("string").as("id"),
      $"o_orderpriority".as("name"),
      $"o_totalprice".cast(DecimalType(18, 2)).cast("string").as("price"),
      $"o_orderstatus".as("category_path"))
    val path = "/tmp/p28_feed.xml"
    // stage breakdown first (this also warms codegen — measured cold, the
    // first action absorbs ~3s of session/janino warmup; warm, the full
    // single-file write is ~2s at sf0.1)
    val catDict = t("catDict plan+collect")(sinks.XmlSink.categoryDictionary(src))
    t("catDict collect")(catDict.orderBy(col("cat_id").cast("int")).collect())
    val elems = sinks.XmlSink.offerElements(src, catDict)
    t("elements write.text")(
      elems.select(expr("substring(xml, 2)").as("value"))
        .write.mode("overwrite").text("/tmp/p28_parts"))
    val srcC = src.localCheckpoint()
    t("src materialize")(srcC.count())
    val catDict2 = sinks.XmlSink.categoryDictionary(srcC)
    t("elements from checkpointed")(
      sinks.XmlSink.offerElements(srcC, catDict2)
        .select(expr("substring(xml, 2)").as("value"))
        .write.mode("overwrite").text("/tmp/p28_parts2"))

    t("write")(sinks.XmlSink.writeYandexMarket(src, path, date = "2025-01-01 00:00"))
    t("write again")(sinks.XmlSink.writeYandexMarket(src, path, date = "2025-01-01 00:00"))
    val cats = t("readCategories")(sources.XmlSource.readCategories(spark, path).count())
    println(s"[p28] cats=$cats")
    val catPaths = sources.XmlSource.categoryPaths(
      sources.XmlSource.readCategories(spark, path))
    val offersDf = t("read (ckpt+infer)")(
      sources.XmlSource.read(spark, path, sources.XmlSource.Yml))
    t("offers parse")(offersDf.count())
    val flat = engine.Flatten.flattenOffers(
      t("read 2 (ckpt+infer)")(
        sources.XmlSource.read(spark, path, sources.XmlSource.Yml)),
      sources.XmlSource.Yml, Some(catPaths))
    t("flatten+count")(flat.count())
    t("flatten+count again")(engine.Flatten.flattenOffers(
      sources.XmlSource.read(spark, path, sources.XmlSource.Yml),
      sources.XmlSource.Yml, Some(catPaths)).count())
    spark.stop()
  }
}
