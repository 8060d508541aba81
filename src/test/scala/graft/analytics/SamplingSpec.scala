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

  test("temperature sample treats a NULL group as a stratum (rows are " +
       "sampled at its computed rate, never silently dropped)") {
    import spark.implicits._
    val docs = (0L until 400L).map(i =>
        (i, if (i < 300) Some("big") else None)).toDF("doc_id", "lang")
    // null group (100 rows) is n_min -> keeps everything at alpha < 1
    val out = Sampling.temperatureSample(docs, "doc_id", "lang", alpha = 0.5)
    val nullKept = out.filter(col("lang").isNull).count()
    assert(nullKept === 100L, s"null stratum keeps all its rows: $nullKept")
  }

  test("exactKPerStratum keeps exactly min(k, n) rows per stratum, " +
       "deterministically") {
    import spark.implicits._
    val docs = (0L until 90L).map(i =>
        (i, if (i < 60) "big" else if (i < 85) "mid" else "tiny"))
      .toDF("doc_id", "lang")
    val out = Sampling.exactKPerStratum(docs, "doc_id", "lang", k = 10)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("big" -> 10L, "mid" -> 10L, "tiny" -> 5L))
    val again = Sampling.exactKPerStratum(docs, "doc_id", "lang", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(again === out.collect().map(_.getLong(0)).toSet)
  }

  test("exactKPerStratum: one stratum holding 90% of the corpus still " +
       "samples exactly k, matches the single-window reference ranking, " +
       "and never funnels the stratum through one task") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 9000 of 10000 rows share one stratum, spread over many partitions
    val docs = (0L until 10000L).map(i =>
        (i, if (i % 10 != 0) "giant" else s"s${i % 70}"))
      .toDF("doc_id", "lang").repartition(16)
    val out = Sampling.exactKPerStratum(docs, "doc_id", "lang", k = 7)
    // reference: the naive single-window ranking (fine at test scale)
    val want = docs.withColumn("rn", row_number().over(
        Window.partitionBy($"lang")
          .orderBy(md5($"doc_id".cast("string")), $"doc_id")))
      .filter($"rn" <= 7).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.collect().map(_.getLong(0)).toSet === want)
    // plan shape: the window touching the FULL corpus must partition by
    // (stratum, pid) — a window partitioned by the bare stratum may only
    // run over the level-1 survivors (a filter on the local rank sits
    // between it and the scan)
    val plan = out.queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .toSeq
    assert(windows.size === 2, s"two-level rank expected:\n$plan")
    val bareStratum = windows.filterNot(_.contains("__graft_pid"))
    assert(bareStratum.size === 1 &&
      plan.indexOf(bareStratum.head) < plan.indexOf("__graft_pid"),
      // optimizedPlan prints top-down: the merge window (bare stratum)
      // must sit ABOVE the pid-bounded window, never directly on the scan
      s"bare-stratum window must be the bounded merge level:\n$plan")
  }

  test("packSequences: spans cover every doc exactly once, every " +
       "sequence holds exactly seqLen tokens except the last, and " +
       "boundaries land mid-doc where the arithmetic says") {
    import spark.implicits._
    val docs = (0L until 100L).map(i =>
        (i, Seq.fill((i % 13).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(8)
    val out = Sampling.packSequences(docs, "doc_id", "text", seqLen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalTokens = (0L until 100L).map(i => (i % 13) + 1).sum
    // every doc's spans sum to its token count and tile it from 0
    val byDoc = out.groupBy(_._1)
    for (i <- 0L until 100L) {
      val spans = byDoc(i).sortBy(_._2)
      assert(spans.map(_._4).sum === (i % 13) + 1, s"doc $i span sum")
      assert(spans.head._3 === 0L, s"doc $i starts at 0")
      val tiled = spans.scanLeft(0L)(_ + _._4).init
      assert(spans.map(_._3).toSeq === tiled.toSeq, s"doc $i spans tile")
    }
    // every sequence is exactly 10 tokens except the final one
    val bySeq = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = bySeq.keys.max
    assert(bySeq.filter(_._1 != lastSeq).values.forall(_ == 10L),
      s"full sequences carry exactly seqLen: $bySeq")
    assert(bySeq(lastSeq) === totalTokens - 10L * lastSeq)
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

  test("weightedSample: exact k, matches the local A-ES computation, " +
       "weight-proportional, excludes nonpositive weights, " +
       "partition-invariant") {
    import spark.implicits._
    // ids 0..199 light (w=1), 200..399 heavy (w=50), plus ineligibles
    val rows = (0L until 200L).map((_, 1L)) ++
      (200L until 400L).map((_, 50L)) ++
      Seq((400L, 0L), (401L, -3L))
    val df = rows.toDF("doc_id", "w")
    def esKey(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
      val u = (h.toDouble + 1.0) / 1152921504606846976.0
      BigDecimal(math.log(u) / w.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, w, esKey(id, w)) }
      .sortBy { case (id, _, key) => (-key, id) }.take(100)
    for (p <- Seq(1, 9)) {
      val got = Sampling.weightedSample(df.repartition(p), "doc_id",
          $"w", k = 100)
        .orderBy($"es_key".desc, $"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.length === 100, s"partitions=$p")
      assert(got.toSeq === expected.toSeq, s"partitions=$p")
      assert(!got.exists(t => t._1 >= 400L), "nonpositive weights excluded")
      // inclusion tracks weight: heavy rows (50x weight, half the pool)
      // must dominate the sample decisively
      assert(got.count(_._2 == 50L) > 80, s"heavy rows: ${got.count(_._2 == 50L)}")
    }
  }

  test("chunkTokenWindows: full coverage with overlap, short tail kept, " +
       "empty docs emit nothing, map-side (no exchange)") {
    import spark.implicits._
    val ws = (0 until 10).map(i => s"w$i").mkString(" ")   // 10 tokens
    val df = Seq((1L, ws), (2L, "a b"), (3L, "   ")).toDF("doc_id", "text")
    val out = Sampling.chunkTokenWindows(df, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getString(4)))
    // doc 1: starts 0,3,6,9 -> lengths 4,4,4,1
    assert(out.filter(_._1 == 1L).toSeq === Seq(
      (1L, 0L, 0L, 4L, "w0 w1 w2 w3"), (1L, 1L, 3L, 4L, "w3 w4 w5 w6"),
      (1L, 2L, 6L, 4L, "w6 w7 w8 w9"), (1L, 3L, 9L, 1L, "w9")))
    // doc 2 shorter than one chunk: single short chunk
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 2L, "a b")))
    // whitespace-only doc: nothing
    assert(!out.exists(_._1 == 3L))
    // every token position of doc 1 is covered by some chunk
    val covered = out.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered === (0L until 10L).toSet)
    // map-side: no shuffle exchange anywhere in the plan
    val plan = Sampling.chunkTokenWindows(df, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("shuffleShards: matches the single-window reference permutation, " +
       "exact shard sizes, partition-invariant, uniform-ish order") {
    import spark.implicits._
    val df = (0L until 500L).toDF("doc_id")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = (0L until 500L).sortBy(id => (md5hex(id.toString), id))
      .zipWithIndex.map { case (id, pos) =>
        (id, pos.toLong, pos.toLong / 100L) }.sortBy(_._1)
    for (p <- Seq(1, 7)) {
      val got = Sampling.shuffleShards(df.repartition(p), "doc_id", 100L)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === expected, s"partitions=$p")
    }
    // every shard holds exactly docsPerShard docs (500 divides evenly)
    val sizes = Sampling.shuffleShards(df, "doc_id", 100L)
      .groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === Map(0L -> 100L, 1L -> 100L, 2L -> 100L,
                         3L -> 100L, 4L -> 100L))
    // the permutation actually shuffles: consecutive ids land in
    // different shards most of the time
    val shardOf = expected.map(t => t._1 -> t._3).toMap
    val together = (0L until 499L).count(i => shardOf(i) == shardOf(i + 1))
    assert(together < 250, s"consecutive ids co-sharded: $together")
  }

  test("mixtureBalance: achieved mixture tracks targets, bottleneck " +
       "domain keeps rate 1.0, absent domains dropped, deterministic") {
    import spark.implicits._
    // en 600, de 150, fr 80, zh 100; targets en .5 de .2 fr .2 es .1
    // N* = min(600/.5=1200, 150/.2=750, 80/.2=400) = 400
    // rates: en .5*400/600=.3333, de .2*400/150=.5333, fr 1.0
    val rows = (0L until 600L).map((_, "en")) ++
      (600L until 750L).map((_, "de")) ++
      (750L until 830L).map((_, "fr")) ++
      (830L until 930L).map((_, "zh"))
    val df = rows.toDF("doc_id", "lang")
    val targets = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1)
    val got = Sampling.mixtureBalance(df, "doc_id", "lang", targets)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byLang.contains("zh"), "absent domain must be dropped")
    assert(!byLang.contains("es"), "target with no corpus rows yields none")
    // bottleneck fr keeps everything
    assert(byLang("fr") === 80)
    // md5 sampling is approximate: expected en 200, de 80 — allow 25%
    assert(math.abs(byLang("en") - 200) < 50, s"en: ${byLang("en")}")
    assert(math.abs(byLang("de") - 80) < 20, s"de: ${byLang("de")}")
    // deterministic across partitionings
    val again = Sampling.mixtureBalance(df.repartition(7), "doc_id", "lang",
        targets)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("chunkSentences: whole sentences pack to the token budget, " +
       "boundary-crossing sentence overflows its chunk, over-budget " +
       "sentence skips chunk ids, empty docs emit nothing, " +
       "partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two three. Four five! Six seven eight nine? Ten."),
      (2L, "a b c d e f g"),
      (3L, "   "),
      (4L, "one two three four five six seven. end.")).toDF("doc_id", "text")
    // counts per sentence: doc1 = 3,2,4,1 -> prefixes 0,3,5,9 -> chunks
    // (B=5) 0,0,1,1; doc2 one 7-token sentence; doc4 = 7,1 -> 0,7
    val got = Sampling.chunkSentences(docs, "doc_id", "text", maxTokens = 5)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, 0L, 2L, 5L, "One two three. Four five!"),
      (1L, 1L, 2L, 5L, "Six seven eight nine? Ten."),
      (2L, 0L, 1L, 7L, "a b c d e f g"),
      (4L, 0L, 1L, 7L, "one two three four five six seven."),
      (4L, 1L, 1L, 1L, "end.")))
    // B=3: doc4 prefixes 0,7 -> chunks 0,2 — id 1 is skipped, never
    // synthesized empty
    val skip = Sampling.chunkSentences(
        docs.filter($"doc_id" === 4L), "doc_id", "text", maxTokens = 3)
      .orderBy("chunk_id").collect().map(r => (r.getLong(1), r.getString(4)))
    assert(skip.toSeq === Seq(
      (0L, "one two three four five six seven."), (2L, "end.")))
    val again = Sampling.chunkSentences(docs.repartition(7), "doc_id",
        "text", maxTokens = 5)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(again.toSeq === got.toSeq)
  }

  test("mixtureEpochs: integer rates replicate exactly, fractional rates " +
       "split floor/floor+1 by md5, most-over-target domain keeps one " +
       "epoch, absent domains dropped, deterministic") {
    import spark.implicits._
    // a 10 docs, b 2 docs, zh untargeted
    val rows = (0L until 10L).map((_, "a")) ++
      (100L until 102L).map((_, "b")) ++ Seq((200L, "zh"))
    val df = rows.toDF("doc_id", "lang")
    // targets .5/.5: N* = max(10/.5=20, 2/.5=4) = 20
    // rate_a = .5*20/10 = 1.0, rate_b = .5*20/2 = 5.0 — both integral
    val got = Sampling.mixtureEpochs(df, "doc_id", "lang",
        Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!got.exists(_._2 == "zh"), "absent domain must be dropped")
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    for (i <- 0L until 10L) assert(byDoc(i) === Seq(0L), s"doc $i")
    for (i <- 100L until 102L)
      assert(byDoc(i) === (0L until 5L), s"doc $i")
    // achieved mixture is exactly the target
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang === Map("a" -> 10, "b" -> 10))
    // fractional: targets .6/.4 -> N* = max(10/.6=16.67, 2/.4=5) = 16.67
    // rate_a = .6*16.67/10 = 1.0, rate_b = .4*16.67/2 = 3.333333
    val frac = Sampling.mixtureEpochs(df, "doc_id", "lang",
        Map("a" -> 0.6, "b" -> 0.4))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fDoc = frac.groupBy(_._1).view.mapValues(_.size).toMap
    for (i <- 0L until 10L) assert(fDoc(i) === 1, s"doc $i")
    for (i <- 100L until 102L)
      assert(fDoc(i) === 3 || fDoc(i) === 4, s"doc $i: ${fDoc(i)}")
    // deterministic across partitionings
    val again = Sampling.mixtureEpochs(df.repartition(5), "doc_id", "lang",
        Map("a" -> 0.6, "b" -> 0.4))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(frac.sortBy(t => (t._1, t._3)).toSeq ===
      again.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("reshardMovement: rendezvous relocates ~1/nTo of keys where " +
       "modulo reshuffles nearly everything; replayable; bad sizes " +
       "refuse") {
    import spark.implicits._
    val keys = (0 until 200).map(i => Tuple1(i.toLong)).toDF("id")
    val got = Sampling.reshardMovement(keys, "id", 4, 5).collect().head
    val (n, mm, mh) = (got.getLong(0), got.getLong(1), got.getLong(2))
    assert(n === 200L)
    // theory: HRW ~ n/5 = 40, modulo ~ 4n/5 = 160; generous brackets
    // keep the pin hash-stable without baking in the exact hash values
    assert(mh < mm, s"rendezvous ($mh) must move fewer than modulo ($mm)")
    assert(mh >= 20L && mh <= 65L, s"HRW moves ~1/5 of 200, got $mh")
    assert(mm >= 130L, s"modulo reshuffles nearly everything, got $mm")
    assert(Sampling.reshardMovement(keys, "id", 4, 5).collect().head
      === got, "deterministic hash placement replays")
    intercept[IllegalArgumentException] {
      Sampling.reshardMovement(keys, "id", 5, 5)
    }
  }

  test("consistentSample: equals the row_number-by-(hash, id) " +
       "reference, bounded at k per key, partition-invariant, and " +
       "membership survives unrelated arrivals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 200L).map(i => (s"k${i % 3}", i)).toDF("key", "id")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("key", "hash32", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = rows(Sampling.consistentSample(df, "key", "id", k = 5))
    assert(got === rows(Sampling.consistentSample(df.repartition(7),
      "key", "id", k = 5)), "partition-invariant")
    assert(got.groupBy(_._1).forall(_._2.size == 5))
    // reference: explicit rank window over the same (hash32, id) order
    val h = conv(substring(md5($"id".cast("string")), 1, 8), 16, 10)
      .cast("long")
    val ref = df.withColumn("h", h)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy($"h", $"id")))
      .filter($"rn" <= 5)
      .select($"key", $"id", $"h".as("hash32"))
    assert(got === rows(ref), "TopKBy == rank-window reference")
    // consistency: adding rows for OTHER ids cannot evict or reorder a
    // key's picks unless the new ids hash lower
    val more = df.union(Seq(("k0", 1000L)).toDF("key", "id"))
    val got2 = rows(Sampling.consistentSample(more, "key", "id", k = 5))
    val stayed = got.filter(_._1 != "k0")
    assert(got2.filter(_._1 != "k0") === stayed,
      "untouched keys identical")
  }
}
