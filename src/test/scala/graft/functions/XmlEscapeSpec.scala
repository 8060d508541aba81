package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class XmlEscapeSpec extends SparkTestBase {

  test("text escape handles & < > and leaves quotes alone") {
    assert(evalStr(XmlEscape.escapeText(lit("""a&b<c>d"e"""))) ===
      """a&amp;b&lt;c&gt;d"e""")
  }

  test("attr escape also escapes double quotes") {
    assert(evalStr(XmlEscape.escapeAttr(lit("""a&b<c>d"e"""))) ===
      "a&amp;b&lt;c&gt;d&quot;e")
  }

  test("clean strings pass through unchanged; null propagates") {
    assert(evalStr(XmlEscape.escapeText(lit("обычный текст 123"))) ===
      "обычный текст 123")
    assert(evalStr(XmlEscape.escapeText(lit(null).cast("string"))) === null)
  }

  test("matches the chained-replace form on generated strings") {
    import spark.implicits._
    val chars = "a&<>\"é "
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString)
    val df = rows.toDF("s")
    val composed = call_function("replace", call_function("replace",
      call_function("replace", col("s"), lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val diff = df.select(
      XmlEscape.escapeText(col("s")).as("k"), composed.as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(diff === 0L)
  }
}
