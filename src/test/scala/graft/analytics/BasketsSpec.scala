package graft.analytics

import graft.SparkTestBase

class BasketsSpec extends SparkTestBase {

  test("coOccurrencePairs: within-basket dedup, canonical a < b order, " +
       "support filter, oversized baskets dropped whole") {
    import spark.implicits._
    // basket 1 holds item 1 TWICE (two lines, one co-occurrence),
    // basket 3 has 4 distinct items and dies to maxBasket = 3
    val items = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 2L), (2L, 1L),
      (3L, 4L), (3L, 5L), (3L, 6L), (3L, 7L)).toDF("bk", "it")
    val got = Baskets.coOccurrencePairs(items, "bk", "it", maxBasket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val supported = Baskets
      .coOccurrencePairs(items, "bk", "it", minSupport = 2L, maxBasket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(supported.toSeq === Seq((1L, 2L, 2L)))
  }

  test("associationRules: hand-computed confidence and lift, both " +
       "directions, scaled-integer lift ordering with id tie-break, " +
       "topK cut; the cap removes a basket from supports AND the " +
       "normalizer together") {
    import spark.implicits._
    // baskets: {1,2} {1,2} {1,3} {2} {1,2,3} -> n=5
    // item support: 1->4, 2->4, 3->2
    // pairs: (1,2)=3  (1,3)=2  (2,3)=1 (below minPairSupport)
    val items = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L),
      (4L, 2L), (5L, 1L), (5L, 2L), (5L, 3L)).toDF("bk", "it")
    val got = Baskets.associationRules(items, "bk", "it").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // lift(1,3) = 2*5/(4*2) = 1.25 beats lift(1,2) = 3*5/(4*4) = 0.9375;
    // within the tie the antecedent id orders
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 0.5, 1.25),
      (3L, 1L, 2L, 1.0, 1.25),
      (1L, 2L, 3L, 0.75, 0.9375),
      (2L, 1L, 3L, 0.75, 0.9375)))
    val top = Baskets.associationRules(items, "bk", "it", topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq === Seq((1L, 3L), (3L, 1L), (1L, 2L)))
    // an oversized basket must vanish from supports and n_baskets both:
    // adding it changes NOTHING
    val noisy = items.union(
      Seq((9L, 11L), (9L, 12L), (9L, 13L), (9L, 14L)).toDF("bk", "it"))
    val got2 = Baskets.associationRules(noisy, "bk", "it", maxBasket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got2.toSeq === got.toSeq)
  }

  test("abcClassification: 80/15/5 revenue shares land A/B/C, a " +
       "revenue tie block classifies as a unit by its block-end " +
       "share, zero-total groups null their share") {
    import spark.implicits._
    val df = Seq(
      // group g: revenues 80 / 15 / 5 -> exactly A / B / C
      ("g", 1L, 80.0), ("g", 2L, 15.0), ("g", 3L, 5.0),
      // group h: two tied items carry ALL revenue -> both classify by
      // the block-end share (100% > 95% -> C), no arbitrary split
      ("h", 4L, 50.0), ("h", 5L, 50.0))
      .toDF("grp", "item", "amt")
    val got = Baskets.abcClassification(df, "grp", "item", "amt")
      .orderBy("grp", "item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getString(4)))
    assert(got.toSeq === Seq(
      ("g", 1L, 80.0, 0.8, "A"),
      ("g", 2L, 15.0, 0.95, "B"),
      ("g", 3L, 5.0, 1.0, "C"),
      ("h", 4L, 50.0, 1.0, "C"),
      ("h", 5L, 50.0, 1.0, "C")))
  }

  test("associationRules is partition-invariant") {
    import spark.implicits._
    val items = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L),
      (4L, 2L), (5L, 1L), (5L, 2L), (5L, 3L)).toDF("bk", "it")
    val base = Baskets.associationRules(items, "bk", "it").collect().toSeq
    for (p <- Seq(1, 7))
      assert(Baskets.associationRules(items.repartition(p), "bk", "it")
        .collect().toSeq === base, s"p=$p")
  }

  test("decayedTopK: recency outranks volume, per-row micro rounding " +
       "pins the score exactly, ties break to the smaller item, k caps " +
       "the shelf") {
    import spark.implicits._
    def d(day: Int) = java.sql.Date.valueOf(f"2024-01-$day%02d")
    val facts = Seq(
      (10L, d(31)), (10L, d(31)),                 // 2 fresh rows
      (20L, d(1)), (20L, d(1)), (20L, d(1)),      // 3 rows at age 30
      (30L, d(31)), (40L, d(31)), (50L, d(31)))   // g2: three 1-row ties
      .toDF("item", "dt")
    val dim = Seq((10L, "g1"), (20L, "g1"), (30L, "g2"), (40L, "g2"),
      (50L, "g2")).toDF("k", "grp")
    val got = Baskets.decayedTopK(facts, "item", "dt", dim, "k", "grp",
        lambda = 0.05, k = 2)
      .orderBy("grp", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val stale = math.round(math.exp(-0.05 * 30.0) * 1e6) // 223130
    assert(got.toSeq === Seq(
      ("g1", 1, 10L, 2L, 2000000L),      // 2 fresh beat 3 stale
      ("g1", 2, 20L, 3L, 3L * stale),
      ("g2", 1, 30L, 1L, 1000000L),      // equal scores: smaller item
      ("g2", 2, 40L, 1L, 1000000L)))     // item 50 cut by k = 2
  }
}
