package graft
import org.apache.spark.sql.SparkSession
/** Smoke-run of the driver's `SparkEntry.entry` contract: prints the
  * flagship-query row count on sf0.001 (driver checks rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4, appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n cols=${df.columns.mkString(",")}")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
