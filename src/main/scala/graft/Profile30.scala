package graft

/** Stage-by-stage wall-clock breakdown of the q30 TF-IDF classification
  * (manual profiling utility, not run by the driver). */
object Profile30 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, appName = "graft-profile30")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").count()

    def t[A](name: String)(f: => A): A = ProfTimer.t("p30", name)(f)

    val docs = queries.Tables(spark, dir, "documents")
    t("docs count")(docs.count())
    // mirror TfIdf.termWeights' actual tokenization (codegen'd split +
    // row filter), not the interpreted array-lambda form it replaced
    val tf = docs
      .select($"doc_id".as("doc"),
        explode(split(trim(lower($"text")), "\\s+")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc", $"term").agg(count(lit(1)).as("tf"))
    t("tf count")(tf.count())
    val weights = t("termWeights (checkpoint)")(
      analytics.TfIdf.termWeights(docs, "doc_id", "text", scale = 1000))
    val centroids = t("centroids plan")(
      analytics.TfIdf.classCentroids(
        weights.filter($"doc" % 10 =!= 0),
        docs.filter($"doc_id" % 10 =!= 0), "doc_id", "lang"))
    t("centroids count")(centroids.count())
    val out = t("classify plan")(
      analytics.TfIdf.classify(weights.filter($"doc" % 10 === 0), centroids))
    t("classify count")(out.count())
    t("full rerun")(
      queries.Catalog.all.find(_.name == "q30_tfidf_classify").get
        .run(spark, dir).count())
    t("full rerun 2")(
      queries.Catalog.all.find(_.name == "q30_tfidf_classify").get
        .run(spark, dir).count())
    spark.stop()
  }
}
