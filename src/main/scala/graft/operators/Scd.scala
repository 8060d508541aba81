package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval builder: collapse a
  * change-event log into versioned validity intervals — the warehouse
  * view of any mutable entity (a user's current plan, a document's
  * latest quality label, a part's price regime). Rows where the tracked
  * attributes did NOT change from the entity's previous row are
  * absorbed into the open interval; each surviving change point opens a
  * version with `valid_from` = its timestamp and `valid_to` = the next
  * change point's (null while current).
  *
  * Scale shape: everything is per-key windows over (ts, tieBreak) — ONE
  * hash exchange on the entity key, history never leaves its
  * partition, no joins. Entity history length is the per-partition
  * bound (the usual SCD assumption: one entity's change log fits a
  * task; a key hot enough to break that is a telemetry firehose, not a
  * dimension). The tie-break column makes equal-timestamp changes
  * deterministic — required, not optional, because a change log with
  * ties and no total order has no well-defined "previous state".
  */
object Scd {

  /** @param changes  change-event log
    * @param key      entity key column
    * @param ts       change timestamp column
    * @param tieBreak unique-per-key column ordering equal timestamps
    * @param attrCols tracked attribute columns (null-safe compared)
    * @return one row per (key, version): key, version (1-based),
    *         attrCols..., valid_from, valid_to, is_current */
  def scd2Intervals(changes: DataFrame, key: String, ts: String,
                    tieBreak: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    // null-safe change detector: a real NULL->value transition is a
    // change; the first row per key (all lags null) always survives
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val isFirst = row_number().over(w) === 1
    val points = changes
      .withColumn("__chg", isFirst || changed)
      .filter(col("__chg"))
    val wp = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    points.select(
      (Seq(col(key),
        row_number().over(wp).cast("long").as("version")) ++
        attrCols.map(col) ++ Seq(
          col(ts).as("valid_from"),
          lead(col(ts), 1).over(wp).as("valid_to"))): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
