package graft

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Approximate-distinct (HLL) sanity: the sketch cannot hash-match a
  * cross-engine oracle, so it is verified here against the exact distinct
  * count within its advertised error bound. */
class MiscAggSpec extends SparkTestBase {

  test("approx_count_distinct stays within 5% of exact per group") {
    val ev = queries.Tables(spark, "/root/testdata/sf0.01", "events")
    val rows = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
           approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
             s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
