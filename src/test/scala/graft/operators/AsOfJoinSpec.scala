package graft.operators

import java.sql.Timestamp
import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  private def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")

  test("attaches the latest right row at-or-before each left timestamp") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(5), "p1"), (2L, 10L, ts(15), "p2"),
                   (3L, 10L, ts(20), "p3"), (4L, 99L, ts(30), "p4"))
      .toDF("id", "k", "ts", "payload")
    val right = Seq((10L, ts(5), "r@5"), (10L, ts(12), "r@12"),
                    (10L, ts(30), "r@30"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rv"))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("rv"))).toSeq ===
      Seq(Some("r@5"),  // equal timestamp included (>=)
          Some("r@12"), // latest at-or-before 15
          Some("r@12"), // r@30 is in the future
          None))        // key 99 has no right rows
  }

  test("NULL join keys match nothing on either side (equi/ASOF semantics)") {
    import spark.implicits._
    val left = Seq((1L, Option(10L), ts(10), "p1"),
                   (2L, Option.empty[Long], ts(10), "p2"))
      .toDF("id", "k", "ts", "payload")
    val right = Seq((Option(10L), ts(5), "r@5"),
                    (Option.empty[Long], ts(5), "r-null"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rv"))
      .orderBy("id").collect()
    assert(Option(out(0).getAs[String]("rv")) === Some("r@5"))
    // the null-key left row must NOT be enriched from the null-key right
    // row — SQL ASOF JOIN (and the DuckDB oracle) matches nothing on NULL
    assert(out(1).isNullAt(out(1).fieldIndex("rv")))
  }

  test("a NULL payload on the latest right row is carried, not skipped") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(6), "p")).toDF("id", "k", "ts", "payload")
    val right = Seq((10L, ts(1), Some("a")), (10L, ts(5), Option.empty[String]))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rv")).collect().head
    // the row at ts=5 is the as-of match; its rv is legitimately NULL
    assert(out.isNullAt(out.fieldIndex("rv")))
  }

  test("differential: matches a brute-force per-row scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val leftRows = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, ts(rnd.nextInt(60)), s"L$i"))
    val rightRows = (1 to 80).map(i =>
        (rnd.nextInt(6).toLong, ts(rnd.nextInt(60)), s"R$i"))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, ts)
    val left = leftRows.toDF("id", "k", "ts", "payload")
    val right = rightRows.toDF("k", "ts", "rv")

    val out = AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rv"))
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("rv"))).toMap

    leftRows.foreach { case (id, k, t, _) =>
      val expect = rightRows
        .filter(r => r._1 == k && !r._2.after(t))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(out(id) === expect, s"row $id key $k ts $t")
    }
  }

  test("forward direction attaches the earliest right row at-or-after") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(5), "p1"), (2L, 10L, ts(13), "p2"),
                   (3L, 10L, ts(40), "p3"))
      .toDF("id", "k", "ts", "payload")
    val right = Seq((10L, ts(5), "r@5"), (10L, ts(12), "r@12"),
                    (10L, ts(30), "r@30"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rv"),
                                direction = "forward")
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("rv"))).toSeq ===
      Seq(Some("r@5"),  // equal timestamp included
          Some("r@30"), // earliest at-or-after 13
          None))        // nothing after 40
  }

  test("tolerance nulls matches farther than the window, both directions") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(20), "p")).toDF("id", "k", "ts", "payload")
    val right = Seq((10L, ts(5), "r@5"), (10L, ts(45), "r@45"))
      .toDF("k", "ts", "rv")
    def run(dir: String, tolSec: Long) =
      AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rv"),
                        direction = dir, toleranceSeconds = Some(tolSec))
        .collect().head
    // backward match is r@5 (15 min away): kept at 20 min tol, nulled at 10
    assert(run("backward", 20 * 60).getAs[String]("rv") === "r@5")
    val b = run("backward", 10 * 60)
    assert(b.isNullAt(b.fieldIndex("rv")))
    // forward match is r@45 (25 min away): kept at 30 min tol, nulled at 20
    assert(run("forward", 30 * 60).getAs[String]("rv") === "r@45")
    val f = run("forward", 20 * 60)
    assert(f.isNullAt(f.fieldIndex("rv")))
  }

  test("interpolateJoin: hand-computed lerp between brackets, exact-ts " +
       "hit returns the point, off-span and keyless probes null, " +
       "null-valued series points are transparent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // series key 1: (100s, 10.0) (200s, 30.0) (250s, null) (400s, 20.0)
    val series = Seq(
      (1L, 100L, Some(10.0)), (1L, 200L, Some(30.0)),
      (1L, 250L, None), (1L, 400L, Some(20.0)))
      .toDF("k", "sec", "value")
      .select($"k", timestamp_seconds($"sec").as("ts"), $"value")
    val left = Seq(
      (1L, 1L, 150L), // mid-bracket: 10 + 20 * 0.5 = 20
      (1L, 2L, 100L), // exact hit -> 10
      (1L, 3L, 300L), // brackets (200,30)-(400,20) ACROSS the null
                      // point: 30 - 10 * 0.5 = 25
      (1L, 4L, 50L),  // before the span -> null
      (1L, 5L, 500L), // after the span -> null
      (2L, 6L, 150L)) // no series for key 2 -> null
      .toDF("k", "id", "sec")
      .select($"k", $"id", timestamp_seconds($"sec").as("ts"))
    val got = AsOfJoin.interpolateJoin(left, series, "k", "ts", "value")
      .collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got === Map(1L -> 20.0, 2L -> 10.0, 3L -> 25.0,
      4L -> null, 5L -> null, 6L -> null))
    // partition invariance
    for (p <- Seq(1, 7)) {
      val g2 = AsOfJoin
        .interpolateJoin(left.repartition(p), series.repartition(p),
          "k", "ts", "value")
        .collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
      assert(g2 === got, s"p=$p")
    }
  }
}
