package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** ScalaCheck-generated inputs evaluated in BATCHED Spark jobs (one job per
  * property over hundreds of generated rows — not one session-roundtrip per
  * case). Properties from SURVEY.md §5: dedup idempotence, sanitize
  * idempotence, prune monotonicity, cosine bounds/symmetry. */
class PropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val tokenGen: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""), Gen.const("  "),
              Gen.const("a b"), Gen.const("///"), Gen.const("x"))
  private val delimitedGen: Gen[String] =
    Gen.listOfN(6, tokenGen).map(_.mkString("///"))

  test("F3 dedupDelimited is idempotent and emits no duplicate items") {
    import spark.implicits._
    val inputs = sample(delimitedGen, 300)
    val df = inputs.toDF("s").select(
      CleanFns.dedupDelimited(col("s")).as("once"))
      .select(col("once"), CleanFns.dedupDelimited(col("once")).as("twice"),
              array_distinct(split(col("once"), "///")).as("distinctItems"),
              split(col("once"), "///").as("items"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1)) // idempotent
      if (r.getString(0).nonEmpty)
        assert(r.getSeq[String](2).length === r.getSeq[String](3).length) // no dups
    }
  }

  test("F3 native expression == composed form on generated inputs") {
    import spark.implicits._
    val inputs = sample(delimitedGen, 400) ++ Seq("", " ", "///", "a///a", null)
    val rows = inputs.toDF("s").select(
      CleanFns.dedupDelimited(col("s")).as("native"),
      CleanFns.dedupDelimitedComposed(col("s")).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) === r.getString(1))
    }
  }

  test("YML round-trip property: write generated offers through the XML " +
       "sink, read+flatten back — names/descriptions/prices/pictures " +
       "survive escaping (XML-special chars, unicode, quotes)") {
    import spark.implicits._
    import graft.sinks.XmlSink
    import graft.sources.XmlSource

    val nasty = Gen.oneOf(
      "plain name", "a & b", "x < y > z", "quote\"inside", "it's",
      "кириллица Ünïcode", "tag<br>like", "&amp;already", "semi;colon",
      "a  double  space")
    val price = Gen.choose(1, 99999).map(n => s"$n.50")
    val pics = Gen.choose(0, 3).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("http://h/a.jpg", "http://h/b&c.png",
                               "http://h/d<e>.gif")).map(_.distinct.mkString("///")))
    val offerGen = for {
      nm <- nasty; pr <- price; pc <- pics; ds <- nasty
    } yield (nm, pr, pc, ds)

    val rows = sample(offerGen, 120).zipWithIndex.map { case ((nm, pr, pc, ds), i) =>
      (s"id$i", nm, pr, pc, ds)
    }
    val src = rows.toDF("id", "name", "price", "pictures", "description")
    val path = java.nio.file.Files.createTempDirectory("graft_prop")
      .resolve("feed.xml").toString
    XmlSink.writeYandexMarket(src, path, date = "2025-01-01 00:00")

    // raw read (no flatten): sink escaping + reader unescaping must be a
    // perfect inverse, modulo the sink's documented cell trim
    val raw = XmlSource.read(spark, path, XmlSource.Yml)
    val pictureIsArray = raw.columns.contains("picture") &&
      raw.schema("picture").dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val back = raw.collect().map { r =>
      def s(n: String): String =
        if (raw.columns.contains(n) && !r.isNullAt(r.fieldIndex(n)))
          Option(r.get(r.fieldIndex(n))).map(_.toString).orNull
        else null
      val pics: Seq[String] =
        if (!raw.columns.contains("picture") ||
            r.isNullAt(r.fieldIndex("picture"))) Seq.empty
        else if (pictureIsArray) r.getSeq[Any](r.fieldIndex("picture"))
          .filter(_ != null).map(_.toString).toSeq
        else Seq(r.get(r.fieldIndex("picture")).toString)
      s("_id") -> ((s("name"), s("price"), pics, s("description")))
    }.toMap

    rows.foreach { case (id, nm, pr, pc, ds) =>
      val (bnm, bpr, bpc, bds) = back(id)
      assert(bnm === nm.trim, s"name for $id")
      // the reader type-infers price as a number ("12.50" -> 12.5):
      // compare numerically, the escaping property lives in the text cols
      assert(bpr.toDouble === pr.toDouble, s"price for $id")
      val expectPics = pc.split("///").map(_.trim).filter(_.nonEmpty).toSeq
      assert(bpc === expectPics, s"pictures for $id")
      assert(bds === ds.trim, s"description for $id")
    }
  }

  test("fuzz: CSV single-file round-trip survives quotes, semicolons, and " +
       "unicode in cells (quote-minimal with doubling both ways)") {
    import graft.sinks.CsvSink
    import graft.sources.CsvSource
    val cellGen = Gen.oneOf(
      "plain", "semi;colon", "quo\"te", "\"wrapped\"", "tricky\"\";mix",
      "кириллица", "tab\there", "  spaced  ", "a,comma", "")
    val rows = sample(Gen.listOfN(3, cellGen).map(l => (l(0), l(1), l(2))), 150)
      .zipWithIndex.map { case ((a, b, c), i) => (i.toString, a, b, c) }
    import spark.implicits._
    val df = rows.toDF("id", "a", "b", "c")
    val path = java.nio.file.Files.createTempDirectory("graft_csvfuzz")
      .resolve("fuzz.csv").toString
    // bypass exportColumns: this property targets the WRITER's quoting, so
    // cells must reach it verbatim
    CsvSink.writeSingleFile(df, path)
    val back = CsvSource.read(spark, path, delimiter = Some(";"))
      .orderBy(col("id").cast("int")).collect()
      .map(r => (r.getString(0),
        Option(r.getString(1)).getOrElse(""),
        Option(r.getString(2)).getOrElse(""),
        Option(r.getString(3)).getOrElse(""))).toSeq
    assert(back === rows)
  }

  test("fuzz: randomly generated offer trees flatten without throwing " +
       "(repeated tags, empty elements, attr-only nodes, nested params)") {
    import graft.sources.XmlSource
    import graft.engine.Flatten
    val rnd = new scala.util.Random(21)
    val tags = Array("name", "price", "size", "opts", "extra", "Размер",
                     "weight", "picture", "param")
    def elem(depth: Int): String = {
      val tag = tags(rnd.nextInt(tags.length))
      val attr = rnd.nextInt(4) match {
        case 0 => " unit=\"kg\""
        case 1 => " name=\"Цвет\""
        case _ => ""
      }
      val body = rnd.nextInt(5) match {
        case 0 => ""                      // empty element
        case 1 => "v" + rnd.nextInt(100)  // scalar text
        case _ if depth < 2 =>
          (0 until rnd.nextInt(3)).map(_ => elem(depth + 1)).mkString
        case _ => "leaf"
      }
      s"<$tag$attr>$body</$tag>"
    }
    val offers = (1 to 40).map { i =>
      val kids = (0 until rnd.nextInt(6)).map(_ => elem(0)).mkString
      s"""<offer id="$i">$kids</offer>"""
    }.mkString
    val xml = s"<yml_catalog><shop><offers>$offers</offers></shop></yml_catalog>"
    val path = java.nio.file.Files.createTempDirectory("graft_fuzz")
      .resolve("fuzz.xml")
    java.nio.file.Files.writeString(path, xml)
    // must parse + flatten + fully evaluate without throwing
    val flat = Flatten.flattenOffers(
      XmlSource.read(spark, path.toString, XmlSource.Yml), XmlSource.Yml, None)
    assert(flat.count() === 40L)
    flat.collect() // force every projected expression
  }

  test("shingles: native WordNgrams expression == composed form on " +
       "generated texts (rows, order, and per-doc shingle sets)") {
    import spark.implicits._
    val wordGen = Gen.oneOf("the", "cat", "sat", "on", "MAT", "a", "b", "..",
                            "  ", "\t", "x\ny")
    val textGen = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    val inputs = sample(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) } ++
      Seq((9001L, ""), (9002L, "   "), (9003L, "one two"),
          (9004L, "one two three"), (9005L, "a a a a a"))
    for (n <- Seq(2, 3)) {
      val df = inputs.toDF("doc_id", "text")
      val nat = graft.analytics.Dedup.shingles(df, "doc_id", "text", n)
        .orderBy("doc", "sh").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val comp = graft.analytics.Dedup.shinglesComposed(df, "doc_id", "text", n)
        .orderBy("doc", "sh").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(nat === comp, s"n=$n")
    }
  }

  test("F2 sanitizeName is idempotent") {
    import spark.implicits._
    val strGen = Gen.listOfN(12, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('«', '»', '№', '°', '™', '©', '(', ')', ' ',
                                  '\t', '?', '.', ',', '&', '<'))).map(_.mkString)
    val inputs = sample(strGen, 300)
    val rows = inputs.toDF("s").select(
      CleanFns.sanitizeName(col("s")).as("once"))
      .select(col("once"), CleanFns.sanitizeName(col("once")).as("twice"))
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("P3 prune keeps every column that has at least one real value") {
    import spark.implicits._
    val cellGen = Gen.oneOf(Gen.const(""), Gen.const(" "), Gen.const("Undefined"),
                            Gen.alphaNumStr.map(_.take(5)))
    val rowGen = Gen.listOfN(4, cellGen)
    (0 until 10).foreach { seed =>
      val rows = sample(rowGen, 8).map(l => (l(0), l(1), l(2), l(3)))
      val df = rows.toDF("c1", "c2", "c3", "c4")
      val kept = Prune.prune(df).columns.toSet
      Seq("c1", "c2", "c3", "c4").foreach { c =>
        val hasReal = rows.exists { t =>
          val v = c match { case "c1" => t._1; case "c2" => t._2
                            case "c3" => t._3; case _ => t._4 }
          v.trim.nonEmpty && v != "Undefined"
        }
        if (hasReal) assert(kept.contains(c), s"dropped non-empty $c")
        else assert(!kept.contains(c), s"kept empty $c")
      }
    }
  }

  test("cosine is symmetric and within [-1, 1] (+ulp) on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0)).map(_.toArray)
    val pairs = sample(Gen.zip(vecGen, vecGen), 200)
      .filter { case (a, b) => a.exists(_ != 0.0) && b.exists(_ != 0.0) }
    val rows = pairs.toDF("a", "b").select(
      graft.analytics.Similarity.cosine(col("a"), col("b")).as("ab"),
      graft.analytics.Similarity.cosine(col("b"), col("a")).as("ba"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9)
    }
  }

  test("oovRate invariants on generated corpora: 0 <= n_oov <= n_tokens, " +
       "rate consistent, rows preserved") {
    import spark.implicits._
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zed",
      "rho", "tau")
    val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val docs = sample(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = (docs ++ Seq((900L, ""), (901L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val out = graft.analytics.TextAnalysis.oovRate(df, "doc_id", "text", 4)
      .collect()
    assert(out.length === docs.length + 2)
    out.foreach { r =>
      val nt = r.getLong(1); val no = r.getLong(2)
      assert(no >= 0 && no <= nt)
      if (nt > 0)
        assert(r.getDouble(3) === no.toDouble / nt)
      else assert(r.isNullAt(3))
    }
  }

  test("unigramSurprisal invariants: scores bounded by the rarest/commonest " +
       "word surprisal; token counts match nTokens") {
    import spark.implicits._
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val docs = sample(docGen, 100).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = graft.analytics.TextAnalysis
      .unigramSurprisal(df, "doc_id", "text").collect()
    // corpus-level min/max possible per-token surprisal
    val counts = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum.toDouble
    val sMin = -math.log(counts.values.max / total)
    val sMax = -math.log(counts.values.min / total)
    out.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= sMin - 1e-6 && s <= sMax + 1e-6,
        s"avg surprisal $s outside [$sMin, $sMax]")
    }
  }
}
