package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ScdSpec extends SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private def rows(df: DataFrame) =
    df.orderBy("k", "version").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(4)) -1L else r.getTimestamp(4).getTime / 1000,
        r.getBoolean(5)))

  private def mk(ts: Seq[(String, Long, Long, String)]) = {
    import spark.implicits._
    ts.toDF("k", "sec", "id", "attr")
      .select($"k", timestamp_seconds($"sec").as("ts"), $"id", $"attr")
  }

  test("scd2Intervals: consecutive same-value rows collapse, change " +
       "points open versions, last version is current; A->B->A re-opens") {
    val log = mk(Seq(
      ("u1", 100L, 1L, "A"), ("u1", 200L, 2L, "A"), // collapses
      ("u1", 300L, 3L, "B"),
      ("u1", 400L, 4L, "B"),                        // collapses
      ("u1", 500L, 5L, "A")))                       // re-opens A
    val got = rows(Scd.scd2Intervals(log, "k", "ts", "id", Seq("attr")))
    assert(got.toSeq === Seq(
      ("u1", 1L, "A", 300L, false),
      ("u1", 2L, "B", 500L, false),
      ("u1", 3L, "A", -1L, true)))
  }

  test("scd2Intervals: equal timestamps order by the tie-break; " +
       "null attribute states collapse null-safely and a null->value " +
       "transition is a change") {
    val log = mk(Seq(
      ("u2", 100L, 1L, "X"), ("u2", 100L, 2L, "Y"),  // tie: X then Y
      ("u3", 100L, 1L, null), ("u3", 200L, 2L, null), // null run collapses
      ("u3", 300L, 3L, "Z")))
    val got = rows(Scd.scd2Intervals(log, "k", "ts", "id", Seq("attr")))
    assert(got.toSeq === Seq(
      ("u2", 1L, "X", 100L, false), // closed by the same-ts Y change
      ("u2", 2L, "Y", -1L, true),
      ("u3", 1L, null, 300L, false),
      ("u3", 2L, "Z", -1L, true)))
  }

  test("scd2Intervals: multi-attribute tracking opens a version when " +
       "ANY tracked column changes; partition-invariant") {
    import spark.implicits._
    val log = Seq(
      ("u4", 100L, 1L, "A", "p1"), ("u4", 200L, 2L, "A", "p2"),
      ("u4", 300L, 3L, "A", "p2"), ("u4", 400L, 4L, "B", "p2"))
      .toDF("k", "sec", "id", "a1", "a2")
      .select($"k", timestamp_seconds($"sec").as("ts"), $"id", $"a1", $"a2")
    def run(df: org.apache.spark.sql.DataFrame) =
      Scd.scd2Intervals(df, "k", "ts", "id", Seq("a1", "a2"))
        .orderBy("k", "version").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    val got = run(log)
    assert(got.toSeq === Seq((1L, "A", "p1"), (2L, "A", "p2"),
      (3L, "B", "p2")))
    for (p <- Seq(1, 7))
      assert(run(log.repartition(p)).toSeq === got.toSeq, s"p=$p")
  }
}
