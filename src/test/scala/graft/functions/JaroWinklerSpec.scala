package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("kernel: the Winkler 1990 classics, exact doubles (pinned to " +
       "DuckDB jaro_winkler_similarity outputs)") {
    // m=6, t=1 -> jaro 17/18; prefix 3 -> + 3*.1*(1/18)
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    // jaro 0.7333 > 0.7 but common prefix 0: boost adds nothing
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
    // word swap: every char matches, half transposed — no prefix boost
    // because jaro lands at 0.709 with prefix 0... actually prefix 0
    assert(jw("goldenrod lavender", "lavender goldenrod")
      === 0.708994708994709)
  }

  test("kernel edges: empties score 0 (INCLUDING both-empty, the " +
       "DuckDB convention), identity is 1, disjoint is 0, boost only " +
       "past 0.7") {
    assert(jw("", "abc") === 0.0 && jw("abc", "") === 0.0)
    assert(jw("", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window 0: no matches at len 2
    // jaro("abcdef","abdcfe")? construct a case with jaro <= 0.7 and a
    // shared prefix: the boost must NOT fire
    val j = jw("abqqqqqq", "abzzzzzz") // m=2, jaro=(2/8+2/8+1)/3 = 0.5
    assert(j === 0.5, "below the 0.7 threshold the prefix adds nothing")
  }

  test("expression: codegen path equals the kernel over a column pair, " +
       "nulls propagate") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("CRATE", "TRACE"))
      .toDF("a", "b")
    val got = df.select(JaroWinkler.jaroWinkler($"a", $"b")).collect()
      .map(_.getDouble(0))
    assert(got.toSeq === Seq(0.9611111111111111, 0.7333333333333334))
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler($"a", $"b")).collect().head
    assert(withNull.isNullAt(0))
  }

  test("blockedNameLink: pairs only within a block, canonical id " +
       "order, threshold cut, over-cap blocks dropped whole") {
    import spark.implicits._
    val df = Seq(
      (1L, "B1", "martha stewart"), (2L, "B1", "marhta stewart"),
      (3L, "B1", "zzzzzz"),            // same block, dissimilar
      (4L, "B2", "martha stewart"),    // other block: never pairs with 1
      (5L, "B3", "aa"), (6L, "B3", "ab"), (7L, "B3", "ac"))
      .toDF("id", "blk", "name")
    val got = graft.analytics.Dedup
      .blockedNameLink(df, "id", "name", Seq("blk"), minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)),
      "only the within-block near-identical pair survives")
    // cap 2: block B3 (3 rows) drops whole; B1's pair survives
    val capped = graft.analytics.Dedup
      .blockedNameLink(df, "id", "name", Seq("blk"), minSim = 0.1,
        maxBlock = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.forall { case (a, b) => Seq(a, b).forall(_ <= 4L) },
      s"over-cap block leaked pairs: ${capped.toSeq}")
  }
}
