package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FixMojibakeSpec extends SparkTestBase {

  private def run(inputs: Seq[String]): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s")
      .select(FixMojibake.fixMojibake(col("s")).as("f"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  /** What a charset-lying server produces: UTF-8 bytes read as Latin-1. */
  private def garble(clean: String): String =
    new String(clean.getBytes(StandardCharsets.UTF_8),
      StandardCharsets.ISO_8859_1)

  /** The cp1252 variant (Windows viewer): bytes 0x80-0x9F become the
    * cp1252 specials (€ ‚ ƒ …) instead of C1 controls. */
  private def garble1252(clean: String): String =
    new String(clean.getBytes(StandardCharsets.UTF_8), "windows-1252")

  test("Latin-1 mojibake round-trips back to the original text") {
    val cleans = Seq("привет мир", "café au lait", "naïve — déjà vu",
      "日本語テキスト", "ελληνικά")
    assert(run(cleans.map(garble)) === cleans)
  }

  test("cp1252 mojibake (€-class specials) also recovers") {
    // 'т' (D1 82) reads as 'Ñ' + 0x82 -> cp1252 '‚'; 'ř' (C5 99) -> 'Å™'
    val cleans = Seq("привет", "Dvořák", "€100 fee")
    val garbled = cleans.map(garble1252)
    assert(garbled.exists(g => g.exists(c => FixMojibakeSpec.Cp1252Special(c))),
      "fixture must actually exercise the cp1252 special range")
    assert(run(garbled) === cleans)
  }

  test("genuine text passes through untouched (strict decode = no false " +
       "positives on real Latin-1 prose, ASCII, or already-clean UTF-8)") {
    val keep = Seq(
      "plain ascii",
      "café über señor",        // real accents: isolated high bytes, malformed as UTF-8
      "привет мир",             // already-clean UTF-8
      "1 € = 1.08 $",           // real euro sign, not a double-encoding
      "")
    assert(run(keep) === keep)
    assert(run(Seq(null)).head === null)
  }

  test("registered as SQL fix_mojibake via GraftExtensions") {
    import spark.implicits._
    val g = garble("добрый день")
    val out = Seq(g).toDF("s")
      .createOrReplaceTempView("moji")
    assert(spark.sql("SELECT fix_mojibake(s) AS f FROM moji")
      .head().getString(0) === "добрый день")
  }
}

object FixMojibakeSpec {
  val Cp1252Special: Set[Char] =
    "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ".toSet
}
