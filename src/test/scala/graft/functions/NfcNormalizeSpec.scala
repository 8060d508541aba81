package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class NfcNormalizeSpec extends SparkTestBase {

  private def run(inputs: Seq[String]): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s")
      .select(NfcNormalize.nfc(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("kernel == java.text.Normalizer on mixed unicode inputs") {
    val inputs = Seq(
      "plain ascii stays put",
      "Café decomposed",          // e + combining acute -> é
      "café already composed",
      "Å angstrom sign",            // U+212B -> U+00C5 under NFC
      "ohm Ω sign",                 // U+2126 -> U+03A9
      "mixed àéî runs",
      "",
      "😀 emoji surrogates")
    val expected = inputs.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(run(inputs) === expected)
    // and the decomposed pair really composed (length shrank)
    assert(run(Seq("Café")).head === "Café")
  }

  test("null propagates; pure-ASCII fast path is identity") {
    assert(run(Seq(null)).head === null)
    val ascii = "the quick brown fox 0123 !?"
    assert(run(Seq(ascii)).head === ascii)
  }
}
