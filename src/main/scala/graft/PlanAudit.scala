package graft
import org.apache.spark.sql.SparkSession
/** Prints formatted physical plans for the structurally interesting
  * queries — the .explain audit loop (run manually, not by the driver). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, appName = "graft-planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q18_ngram_jaccard", "q25_knn_ivf", "q30_tfidf_classify")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = queries.Catalog.byName(n).run(spark, dir)
      df.count() // materialize so AQE finalizes reuse decisions
      df.explain("formatted")
    }
    spark.stop()
  }
}
