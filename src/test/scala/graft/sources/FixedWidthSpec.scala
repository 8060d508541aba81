package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

class FixedWidthSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft_fw").toString

  test("round-trip: values come back by position, padding trims, " +
       "nulls read as empty strings") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("alpha"), "x"),
      (2L, None: Option[String], "yy"),
      (3L, Some("exact"), "z"))
      .toDF("id", "name", "tag")
    val widths = Seq("id" -> 4, "name" -> 5, "tag" -> 3)
    val dir = tmp()
    FixedWidth.write(df, widths, dir)
    val got = FixedWidth.read(spark, dir, widths)
      .orderBy($"id".cast("long")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("1", "alpha", "x"), ("2", "", "yy"), ("3", "exact", "z")))
    // the physical lines really are fixed character spans
    val line = spark.read.text(dir).collect().map(_.getString(0))
    assert(line.forall(_.length === 12), line.mkString("|"))
  }

  test("overflow truncates to the declared width (the format has no " +
       "escape hatch); non-ASCII counts CHARACTERS, not bytes") {
    import spark.implicits._
    val dir = tmp()
    val widths = Seq("v" -> 4)
    FixedWidth.write(Seq("abcdefgh", "déjà", "日本").toDF("v"),
      widths, dir)
    val got = FixedWidth.read(spark, dir, widths).collect()
      .map(_.getString(0)).sorted
    assert(got.toSeq === Seq("abcd", "déjà", "日本"),
      "8 chars truncate to 4; 4-char unicode survives; 2-char pads/trims")
  }
}
