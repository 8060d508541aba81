package graft.operators

import graft.SparkTestBase

class SkylineSpec extends SparkTestBase {

  test("paretoFrontier2d: dominated points drop, equal-minimize blocks " +
       "keep only their best, equal-coordinate twins keep the id-first " +
       "one, groups are independent; partition-invariant") {
    import spark.implicits._
    val df = Seq(
      // group g: (1.0, 5) and (2.0, 10) are the frontier; (3.0, 7) is
      // dominated by (2.0, 10)
      ("g", 1L, 1.0, 5), ("g", 2L, 2.0, 10), ("g", 3L, 3.0, 7),
      // equal price 4.0: only the bigger size survives the block
      ("g", 4L, 4.0, 20), ("g", 5L, 4.0, 15),
      // exact twin of id 4: dominated by its earlier-id copy
      ("g", 6L, 4.0, 20),
      // group h: a single point is always on its frontier — even one
      // that would be dominated in g
      ("h", 7L, 9.0, 1))
      .toDF("grp", "id", "price", "size")
    def run(d: org.apache.spark.sql.DataFrame) =
      Skyline.paretoFrontier2d(d, "grp", "price", "size", "id")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(t => (t._1, t._2))
    val got = run(df)
    assert(got.toSeq === Seq(("g", 1L), ("g", 2L), ("g", 4L), ("h", 7L)))
    for (p <- Seq(1, 7))
      assert(run(df.repartition(p)).toSeq === got.toSeq, s"p=$p")
  }
}
