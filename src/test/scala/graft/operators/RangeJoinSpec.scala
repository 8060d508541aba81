package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed range join matches the naive range predicate exactly " +
       "(boundaries, multi-bin spans, inverted intervals)") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2025-01-01 00:00:00")), // == start: included
      (2L, ts("2025-01-01 00:59:59")),
      (3L, ts("2025-01-01 01:00:00")), // == end of iv A: excluded there
      (4L, ts("2025-01-01 03:30:00")), // inside the 3-bin interval
      (5L, ts("2025-01-01 07:00:00"))  // matches nothing
    ).toDF("pid", "ts")
    val intervals = Seq(
      (10L, ts("2025-01-01 00:00:00"), ts("2025-01-01 01:00:00")), // A
      (11L, ts("2025-01-01 00:30:00"), ts("2025-01-01 03:45:00")), // spans 4 bins
      (12L, ts("2025-01-01 05:00:00"), ts("2025-01-01 05:00:00")), // empty
      (13L, ts("2025-01-01 06:00:00"), ts("2025-01-01 05:00:00"))  // inverted
    ).toDF("iid", "start_ts", "end_ts")

    val got = RangeJoin.byBucket(points, "ts", intervals, "start_ts", "end_ts")
      .select($"pid", $"iid").orderBy($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = points.join(intervals,
        $"ts" >= $"start_ts" && $"ts" < $"end_ts")
      .select($"pid", $"iid").orderBy($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === naive)
    assert(got === Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)))
  }

  test("each match appears exactly once even when interval and point share " +
       "several bin-sized stretches") {
    import spark.implicits._
    val points = (0 until 50).map(i =>
      (i.toLong, new Timestamp(1735689600000L + i * 600000L))) // every 10 min
      .toDF("pid", "ts")
    val intervals = Seq(
      (1L, new Timestamp(1735689600000L), new Timestamp(1735689600000L + 8 * 3600000L)))
      .toDF("iid", "start_ts", "end_ts")
    val joined = RangeJoin.byBucket(points, "ts", intervals, "start_ts", "end_ts",
                                    binSeconds = 1800L)
    assert(joined.count() === joined.select("pid", "iid").distinct().count())
    assert(joined.count() === 48L) // 8h window, 10-min cadence, end exclusive
  }

  test("pre-epoch timestamps bin exactly (floor semantics, not div's " +
       "truncation toward zero)") {
    import spark.implicits._
    // 1969: unix_micros is negative; truncating division would misalign a
    // point at -0.5h with an interval [-1h, 0h) across the bin boundary
    val points = Seq(
      (1L, ts("1969-12-31 23:30:00")),
      (2L, ts("1969-12-31 22:59:59")),
      (3L, ts("1970-01-01 00:00:00"))).toDF("pid", "ts")
    val intervals = Seq(
      (10L, ts("1969-12-31 23:00:00"), ts("1970-01-01 00:00:00")),
      (11L, ts("1969-12-31 22:00:00"), ts("1969-12-31 23:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    val got = RangeJoin.byBucket(points, "ts", intervals, "start_ts", "end_ts")
      .select($"pid", $"iid").orderBy($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = points.join(intervals,
        $"ts" >= $"start_ts" && $"ts" < $"end_ts")
      .select($"pid", $"iid").orderBy($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === naive)
    assert(got === Seq((1L, 10L), (2L, 11L)))
  }

  test("generated differential: bucketed == naive on random points and " +
       "intervals across bin sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = 1735689600000L
    val points = (1 to 400).map(i =>
      (i.toLong, new Timestamp(base + rnd.nextInt(86400) * 1000L)))
      .toDF("pid", "ts")
    val intervals = (1 to 40).map { i =>
      val s = base + rnd.nextInt(86400) * 1000L
      // mix zero-length, short, long, and inverted intervals
      val e = s + (rnd.nextInt(5) match {
        case 0 => 0L
        case 1 => -3600000L
        case 2 => rnd.nextInt(600) * 1000L
        case _ => rnd.nextInt(8 * 3600) * 1000L
      })
      (i.toLong, new Timestamp(s), new Timestamp(e))
    }.toDF("iid", "start_ts", "end_ts")
    val naive = points.join(intervals,
        $"ts" >= $"start_ts" && $"ts" < $"end_ts")
      .select($"pid", $"iid").orderBy($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (bin <- Seq(60L, 1800L, 3600L, 7 * 3600L)) {
      val got = RangeJoin.byBucket(points, "ts", intervals,
                                   "start_ts", "end_ts", binSeconds = bin)
        .select($"pid", $"iid").orderBy($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === naive, s"binSeconds=$bin")
    }
  }

  test("plan is an equi join on the bin, not a nested-loop product") {
    import spark.implicits._
    val points = Seq((1L, ts("2025-01-01 00:00:00"))).toDF("pid", "ts")
    val intervals = Seq((1L, ts("2025-01-01 00:00:00"), ts("2025-01-01 01:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    val df = RangeJoin.byBucket(points, "ts", intervals, "start_ts", "end_ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
           s"range join must not plan a nested loop:\n$plan")
  }
}
