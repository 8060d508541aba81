package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** The SQL registrations must behave exactly like the Column wrappers —
  * each kernel is evaluated both ways over the same frame and compared. */
class GraftExtensionsSpec extends SparkTestBase {

  test("every registered SQL function equals its Column-wrapper form") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0),
       "the cat <sat> & the \"cat\" sat, again", "a///b///a///c"))
      .toDF("a", "b", "t", "d")
    df.createOrReplaceTempView("ext_probe")
    val sql = spark.sql(
      """SELECT cosine_sim(a, b) AS c, dot_product(a, b) AS dp,
        |       word_ngrams(t, 3) AS ng, xml_escape_text(t) AS xt,
        |       xml_escape_attr(t) AS xa, csv_quote(t) AS cq,
        |       dedup_delimited(d, '///') AS dd, nfc_normalize(t) AS nf
        |FROM ext_probe""".stripMargin).head()
    val wrapped = df.select(
      CosineSimilarity.cosineSim($"a", $"b").as("c"),
      DotProduct.dotProduct($"a", $"b").as("dp"),
      WordNgrams.wordNgrams($"t", 3).as("ng"),
      XmlEscape.escapeText($"t").as("xt"),
      XmlEscape.escapeAttr($"t").as("xa"),
      CsvQuote.quoteCell($"t").as("cq"),
      DedupDelimited.dedupDelimited($"d", "///").as("dd"),
      NfcNormalize.nfc($"t").as("nf")).head()
    assert(sql === wrapped)
  }

  test("word_ngrams rejects a non-literal n with a clear message") {
    val err = intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b c', 1 + 1)").collect()
    }
    assert(err.getMessage.contains("literal INT"), err.getMessage)
  }
}
