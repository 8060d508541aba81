package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {

  test("pageRank: triangle graph is its own fixed point at 1/3 each; " +
       "path graph matches a local replay; partition-invariant") {
    import spark.implicits._
    // K3: uniform is the exact fixed point — every round returns 1/3
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val r3 = Graph.pageRank(k3, "a", "b", iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r3 === Map(1L -> 0.333333, 2L -> 0.333333, 3L -> 0.333333))
    // path 1-2-3: replay the same recurrence locally
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    var (ra, rb) = (1.0 / 3, 1.0 / 3) // rc == ra by symmetry
    for (_ <- 1 to 10) {
      val (na, nb) = (0.15 / 3 + 0.85 * (rb / 2),
        0.15 / 3 + 0.85 * (ra + ra))
      ra = na; rb = nb
    }
    for (p <- Seq(1, 7)) {
      val got = Graph.pageRank(path.repartition(p), "a", "b", iters = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(math.abs(got(1L) - ra) < 2e-6 && math.abs(got(3L) - ra) < 2e-6,
        s"p=$p ends ${got(1L)} vs $ra")
      assert(math.abs(got(2L) - rb) < 2e-6, s"p=$p middle ${got(2L)} vs $rb")
      assert(math.abs(got.values.sum - 1.0) < 1e-4, "ranks sum to ~1")
    }
  }

  test("triangleCounts: one triangle plus a tail — counts, degrees and " +
       "clustering hand-pinned; reversed/duplicated pairs collapse") {
    import spark.implicits._
    // {1,2,3} triangle + pendant edge 3-4; pairs deliberately include
    // a reversed duplicate (3,1) and an exact duplicate (1,2)
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("a", "b")
    val got = Graph.triangleCounts(pairs, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    assert(got(0) === ((1L, 2L, 1L, 1.0)))
    assert(got(1) === ((2L, 2L, 1L, 1.0)))
    assert(got(2)._1 === 3L && got(2)._2 === 3L && got(2)._3 === 1L &&
      got(2)._4 === 0.333333)
    assert(got(3)._1 === 4L && got(3)._2 === 1L && got(3)._3 === 0L &&
      got(3)._4.isNaN, "degree-1 node: null clustering")
  }
}
