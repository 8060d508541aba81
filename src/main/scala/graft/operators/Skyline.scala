package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) over two criteria — the "cheapest thing
  * that is also the biggest/best" query: a row survives when no other
  * row in its group is at least as good on BOTH axes and strictly
  * better on one. The catalog-curation shape: frontier of (cost,
  * quality) per source picks the documents worth keeping at every
  * price point.
  *
  * 2D skylines need no pair joins: sort each group by (minimize asc,
  * maximize desc, id) and keep a row iff its maximize value strictly
  * exceeds the running maximum over all STRICTLY preceding rows — the
  * classic sweep, one window pass. Equal-coordinate duplicates keep
  * only the first by id (an identical point is dominated by its twin);
  * an equal-minimize block is ordered maximize-desc so only its best
  * can survive.
  *
  * Scale shape: the skyline is DISTRIBUTIVE — a globally non-dominated
  * point is non-dominated within its partition — so the sweep runs
  * TWO-PHASE: a local skyline per (group, input-partition) first
  * (parallel window sorts over partition-sized slices, never one sort
  * per group over the whole group's volume — a 3-group billion-row
  * feed would otherwise serialize into 3 giant sort tasks), then the
  * same sweep once more over the local survivors, which are
  * frontier-sized. Identical output to the one-pass form, including
  * the id-first twin rule (a cross-partition twin survives both local
  * passes; the global pass keeps the id-smallest). No self-join, no
  * pair term anywhere. Output: the surviving rows with their original
  * column names. */
object Skyline {

  def paretoFrontier2d(df: DataFrame, groupCol: String, minimizeCol: String,
                       maximizeCol: String, idCol: String): DataFrame = {
    def sweep(d: DataFrame, parts: Seq[String]): DataFrame = {
      val w = Window.partitionBy(parts.map(col): _*)
        .orderBy(col(minimizeCol).asc, col(maximizeCol).desc, col(idCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      d.withColumn("__best_prev", max(col(maximizeCol)).over(w))
        .filter(col("__best_prev").isNull ||
          col(maximizeCol) > col("__best_prev"))
        .drop("__best_prev")
    }
    val clean = df.filter(col(groupCol).isNotNull &&
        col(minimizeCol).isNotNull && col(maximizeCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(groupCol), col(idCol), col(minimizeCol),
        col(maximizeCol))
    val local = sweep(clean.withColumn("__pid", spark_partition_id()),
      Seq(groupCol, "__pid")).drop("__pid")
    sweep(local, Seq(groupCol))
      .select(col(groupCol), col(idCol), col(minimizeCol),
        col(maximizeCol))
  }
}
