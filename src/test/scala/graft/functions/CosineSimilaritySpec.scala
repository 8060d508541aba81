package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.analytics.Similarity

class CosineSimilaritySpec extends SparkTestBase {

  test("codegen'd cosine matches the composed HOF formula bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        Similarity.asDouble(col("a")).as("ad"),
        Similarity.asDouble(col("b")).as("bd"))
    val out = df.select(
      Similarity.cosine(col("ad"), col("bd")).as("fast"),
      (Similarity.dot(col("ad"), col("bd")) /
        (Similarity.norm(col("ad")) * Similarity.norm(col("bd")))).as("slow"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("float arrays are implicitly cast (exact)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val v = df.select(Similarity.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("degenerate inputs yield null: unequal lengths and zero-norm " +
       "vectors (the composed form THROWS under default ANSI mode)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0), Array(0.0, 0.0)))
      .toDF("a", "b", "z")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("uneq"),
      Similarity.cosine(col("a"), col("z")).as("zero"))
      .collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
    // composed Divide raises DIVIDE_BY_ZERO under spark.sql.ansi.enabled
    // (Spark 4 default) — the native expression degrades gracefully instead
    val e = intercept[Exception] {
      df.select((Similarity.dot(col("a"), col("z")) /
        (Similarity.norm(col("a")) * Similarity.norm(col("z")))).as("boom"))
        .collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("a null ELEMENT yields null, matching the composed form (reading " +
       "it as 0.0 would fabricate a finite similarity)") {
    import spark.implicits._
    val df = Seq((1L, Seq[java.lang.Double](1.0, null, 2.0),
                      Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("id", "a", "b")
      .select(graft.functions.CosineSimilarity.cosineSim(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("sim"))
    assert(df.collect().head.isNullAt(0))
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(Similarity.cosine(col("a"), col("b"))).collect().head.isNullAt(0))
  }
}
