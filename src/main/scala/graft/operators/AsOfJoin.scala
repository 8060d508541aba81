package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key — the canonical event-stream
  * enrichment operator (not present in the reference, which has no
  * time-series surface; added as an engine extension, oracle = DuckDB's
  * native ASOF JOIN).
  *
  * Implementation is the scalable union+window form rather than a custom
  * SparkPlan (preference order per the build brief: compose built-ins
  * first): tag both sides, sort within one (key)-partitioned window by
  * (ts, tag) with right rows ordered before left rows at equal
  * timestamps, and carry the last non-null right payload forward. ONE
  * shuffle on the join key, no range explosion, no per-row probing —
  * survives arbitrary key cardinality and time skew (state per partition
  * is a running last-value, not a buffered range).
  *
  * The right side must be unique per (key, ts) for deterministic results —
  * pre-aggregate it (the caller chooses how ties collapse).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side, unique per (key, ts)
    * @param key       equi-join key column name (same name both sides)
    * @param ts        event-time column name (same name both sides)
    * @param rightCols right payload columns to carry (renamed as given)
    * @param direction "backward" (latest right.ts <= left.ts, the default)
    *                  or "forward" (earliest right.ts >= left.ts) — the
    *                  forward form is the same carry over a time-reversed
    *                  window
    * @param toleranceSeconds when set, matches farther than this from
    *                  left.ts are nulled out (pandas merge_asof tolerance)
    * @return left rows + carried right payload (null when no match)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String],
               direction: String = "backward",
               toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
            s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    require(!rightCols.exists(leftCols.contains),
            "right payload columns must not collide with left columns")

    // ASOF/equi semantics: NULL keys match NOTHING. Dropping null-key
    // right rows suffices — null-key left rows then share a window
    // partition with no right rows and carry a null payload (without the
    // filter, the null-key partition would enrich left rows from null-key
    // right rows, which SQL ASOF JOIN and the DuckDB oracle never do).
    val taggedRight = right.filter(col(key).isNotNull).select(
      (Seq(col(key), col(ts), lit(0).as("__side")) ++
        rightCols.map(col) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(ts), lit(1).as("__side")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col)): _*)

    val unioned = taggedRight.unionByName(taggedLeft)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so equal
    // timestamps match in BOTH directions; forward is the identical carry
    // over the time-reversed ordering
    val tsOrder = if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(col(key)).orderBy(tsOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry the whole payload (+ the matched right ts, for tolerance) as
    // ONE struct that is non-null for every right ROW —
    // last(payloadCol, ignoreNulls) alone would skip a right row whose
    // payload value is legitimately NULL and resurrect a stale older value
    val packed = unioned.withColumn("__rrow",
      when(col("__side") === 0,
           struct((col(ts).as("__rts") +: rightCols.map(col)): _*)))
    val carried = packed.withColumn("__rlast",
      last(col("__rrow"), ignoreNulls = true).over(w))
    val withinTol: Column = toleranceSeconds match {
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            unix_micros(col(ts)) - unix_micros(col("__rlast.__rts"))
          else unix_micros(col("__rlast.__rts")) - unix_micros(col(ts))
        gap <= tol * 1000000L
      case None => lit(true)
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => when(withinTol, col(s"__rlast.$c")).as(c))): _*)
  }
}
