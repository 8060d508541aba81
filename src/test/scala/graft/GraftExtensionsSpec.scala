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

  test("the scalar winnow_fp and the aggregates kmv_sketch/cov_moments " +
       "equal their Column-wrapper forms through SQL") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y z x y z x y"))
      .toDF("id", "t")
    docs.createOrReplaceTempView("ext_docs")
    val sqlFp = spark.sql(
      "SELECT id, winnow_fp(t, 3, 2) AS fp FROM ext_docs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val wrapFp = docs.select($"id", WinnowFp.winnowFp($"t", 3, 2).as("fp"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(sqlFp.toSeq === wrapFp.toSeq)

    val nums = Seq(("g", 5L), ("g", 3L), ("g", 5L), ("g", 9L))
      .toDF("g", "h")
    nums.createOrReplaceTempView("ext_nums")
    val sqlKmv = spark.sql(
      "SELECT kmv_sketch(h, 2) AS mins FROM ext_nums GROUP BY g")
      .head().getSeq[Long](0)
    assert(sqlKmv === Seq(3L, 5L))

    val vecs = Seq((1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0)))
      .toDF("id", "v")
    vecs.createOrReplaceTempView("ext_vecs")
    val m = spark.sql("SELECT cov_moments(v) AS m FROM ext_vecs")
      .head().getSeq[Double](0)
    // [d=2, n=2, sx=(4,6), sxx upper=(10,14,20)]
    assert(m === Seq(2.0, 2.0, 4.0, 6.0, 10.0, 14.0, 20.0))

    val words = Seq("a", "a", "a", "b", "c").toDF("w")
    words.createOrReplaceTempView("ext_words")
    val sqlMg = spark.sql(
      "SELECT misra_gries(w, 2) AS cand FROM ext_words")
      .head().getSeq[String](0)
    val wrapMg = words
      .agg(MisraGries.mgCandidates($"w", 2).as("cand"))
      .head().getSeq[String](0)
    assert(sqlMg === wrapMg)

    val scored = Seq((3.0, 30L), (1.0, 10L), (2.0, 20L)).toDF("s", "id")
    scored.createOrReplaceTempView("ext_scored")
    val sqlTop = spark.sql(
      "SELECT top_k_by(s, id, 2) AS t FROM ext_scored")
      .select(posexplode($"t")).select($"col.score", $"col.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(sqlTop === Seq((1.0, 10L), (2.0, 20L)))
  }

  test("word_ngrams rejects a non-literal n with a clear message") {
    val err = intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b c', 1 + 1)").collect()
    }
    assert(err.getMessage.contains("literal INT"), err.getMessage)
  }
}
