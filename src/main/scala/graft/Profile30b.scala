package graft

/** Micro-isolation of the q30 tf stage (manual profiling utility). */
object Profile30b {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, appName = "graft-profile30b")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p30b] $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val raw = spark.read.parquet(s"$dir/documents.parquet")
    t("npartitions")(println("  parts=" + raw.rdd.getNumPartitions))
    val docs = queries.Tables(spark, dir, "documents")
    t("par.ensure")(analytics.Par.ensure(docs))
    val ens = analytics.Par.ensure(docs)
    t("tokens explode count")(
      ens.select($"doc_id".as("doc"),
        explode(analytics.Dedup.tokens($"text")).as("term")).count())
    t("tokens explode again")(
      ens.select($"doc_id".as("doc"),
        explode(analytics.Dedup.tokens($"text")).as("term")).count())
    t("split only")(
      ens.select($"doc_id".as("doc"),
        explode(split(trim(lower($"text")), "\\s+")).as("term")).count())
    t("tf groupBy")(
      ens.select($"doc_id".as("doc"),
        explode(analytics.Dedup.tokens($"text")).as("term"))
        .groupBy($"doc", $"term").agg(count(lit(1)).as("tf")).count())
    t("tf groupBy again")(
      ens.select($"doc_id".as("doc"),
        explode(analytics.Dedup.tokens($"text")).as("term"))
        .groupBy($"doc", $"term").agg(count(lit(1)).as("tf")).count())
    t("no-ensure tf groupBy")(
      docs.select($"doc_id".as("doc"),
        explode(analytics.Dedup.tokens($"text")).as("term"))
        .groupBy($"doc", $"term").agg(count(lit(1)).as("tf")).count())
    spark.stop()
  }
}
