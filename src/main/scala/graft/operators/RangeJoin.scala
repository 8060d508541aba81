package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows whose timestamp falls inside
  * [start, end) of an interval table. Engine extension (the reference has no
  * temporal joins at all); companion to the as-of join in [[AsOfJoin]].
  *
  * A naive `points.join(intervals, ts >= start && ts < end)` has no equi
  * key, so Spark plans BroadcastNestedLoopJoin — O(|points| x |intervals|)
  * comparisons, a scale-killer once intervals stop being broadcast-sized.
  *
  * The scale shape is BUCKETED: time is cut into fixed-width bins; each
  * interval explodes to the bins it covers, each point maps to exactly ONE
  * bin, and the join becomes a plain shuffled EQUI join on the bin id plus
  * the exact range filter. Work is O(|points| + |intervals| x avgSpanBins +
  * |matches|), all integer arithmetic on unix_micros (exact). Because a
  * point owns exactly one bin, no post-join dedup is needed.
  *
  * Pick `binSeconds` near the typical interval length: too small explodes
  * intervals into many bins, too large puts unrelated points in the same
  * bin (filtered, but shuffled first).
  */
object RangeJoin {

  /** @param points    fact table with a timestamp column `tsCol`
    * @param intervals interval table with [startCol, endCol) timestamps;
    *                  empty/inverted intervals (end <= start) match nothing
    * @param binSeconds bucket width in seconds
    */
  /** floor(um / w) in pure long arithmetic. `floor(col / w)` goes through
    * DOUBLE division, which rounds above 2^53 µs and can put a point and
    * its interval in different bins (a silently DROPPED match — the
    * post-join filter only removes false positives). `div` truncates
    * toward zero, so pre-epoch timestamps need the -1 adjustment. */
  private def floorDivBin(um: Column, w: Long): Column = {
    val q = call_function("div", um, lit(w))
    when(um < 0 && (um % w) =!= 0, q - 1).otherwise(q)
  }

  def byBucket(points: DataFrame, tsCol: String,
               intervals: DataFrame, startCol: String, endCol: String,
               binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val w = binSeconds * 1000000L // bin width in microseconds
    val p = points.withColumn("__bin", floorDivBin(unix_micros(col(tsCol)), w))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(
          floorDivBin(unix_micros(col(startCol)), w),
          // end is EXCLUSIVE: an interval ending exactly on a bin boundary
          // does not cover that bin
          floorDivBin(unix_micros(col(endCol)) - 1, w))))
    p.join(iv, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
