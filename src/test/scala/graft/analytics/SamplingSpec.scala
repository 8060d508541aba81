package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {

  test("stratified sample is deterministic, honors 0/1 rates, keeps " +
       "unlisted strata") {
    import spark.implicits._
    val docs = (0L until 400L).map(i =>
        (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.0))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("de"), "rate 0 must drop the whole stratum")
    assert(byLang("fr") === 200L, "unlisted strata keep everything")
    val en = byLang.getOrElse("en", 0L)
    assert(en > 20 && en < 80, s"~50% of 100 en docs expected, got $en")
    // determinism: same input -> same rows
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.0)).collect().map(_.getLong(0)).toSet
    assert(again === out.collect().map(_.getLong(0)).toSet)
  }

  test("hexThreshold renders fixed-width lowercase hex at extreme rates") {
    for (r <- Seq(1e-12, 0.25, 0.5, 1.0 - 1e-12)) {
      val h = Sampling.hexThreshold(r)
      assert(h.length === 8 && h.matches("[0-9a-f]{8}"), s"rate $r -> $h")
    }
  }

  test("temperature sample: alpha=1 keeps everything; alpha<1 keeps the " +
       "smallest group whole and downsamples the big one near its rate") {
    import spark.implicits._
    val docs = (0L until 400L).map(i =>
        (i, if (i < 300) "big" else "small")).toDF("doc_id", "lang")
    val all = Sampling.temperatureSample(docs, "doc_id", "lang", alpha = 1.0)
    assert(all.count() === 400L, "alpha=1 is the identity")
    val out = Sampling.temperatureSample(docs, "doc_id", "lang", alpha = 0.5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("small") === 100L, "n_min group keeps everything")
    // rate_big = (300/100)^(-0.5) = 0.577 -> expect ~173 of 300
    assert(byLang("big") > 120 && byLang("big") < 230,
      s"~58% of 300 expected, got ${byLang("big")}")
    // deterministic: same input -> same id set
    val again = Sampling.temperatureSample(docs, "doc_id", "lang", alpha = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(again === out.collect().map(_.getLong(0)).toSet)
  }

  test("token shards: distributed prefix sum matches the naive global window") {
    import spark.implicits._
    val docs = (0L until 300L).map(i =>
        (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(8)
    val dist = Sampling.tokenBudgetShards(docs, "doc_id", "text", 50L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = docs
      .select($"doc_id", TextAnalysis.nTokens($"text").cast("long").as("n"))
      .withColumn("prefix",
        sum($"n").over(Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"n")
      .select($"doc_id", $"n", expr("prefix DIV 50").as("shard"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dist.toSeq === naive.toSeq)
    // shards are consecutive and non-decreasing in id order
    val shards = dist.map(_._3)
    assert(shards.zip(shards.tail).forall { case (a, b) => b == a || b == a + 1 })
  }
}
