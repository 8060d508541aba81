package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {

  test("KmvSketch: bounded at k, dedups, exact below k, partition-" +
       "invariant") {
    import spark.implicits._
    val vals = (1L to 100L).flatMap(v => Seq(v, v)) // every value twice
    val df = vals.toDF("h").withColumn("g", lit("a"))
    val mins = df.groupBy("g")
      .agg(graft.functions.KmvSketch.kmvMinHashes($"h", 16).as("mins"))
      .collect().head.getSeq[Long](1)
    assert(mins === (1L to 16L), "k smallest DISTINCT values, ascending")
    val small = Seq(5L, 3L, 5L, 9L).toDF("h").withColumn("g", lit("a"))
      .groupBy("g")
      .agg(graft.functions.KmvSketch.kmvMinHashes($"h", 16).as("mins"))
      .collect().head.getSeq[Long](1)
    assert(small === Seq(3L, 5L, 9L), "below k the sketch IS the set")
    // merge path: many partitions must agree with one partition
    for (p <- Seq(1, 7)) {
      val m = df.repartition(p).groupBy("g")
        .agg(graft.functions.KmvSketch.kmvMinHashes($"h", 16).as("mins"))
        .collect().head.getSeq[Long](1)
      assert(m === (1L to 16L), s"partitions=$p")
    }
  }

  test("KmvSketch: randomized differential vs sorted-distinct-take-k " +
       "across groups and partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(3000)((s"g${rnd.nextInt(3)}",
      rnd.nextLong() & Long.MaxValue))
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).distinct.sorted.take(16).toSeq).toMap
    for (p <- Seq(2, 11)) {
      val got = rows.toDF("g", "h").repartition(p).groupBy("g")
        .agg(graft.functions.KmvSketch.kmvMinHashes($"h", 16).as("mins"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got === expected, s"partitions=$p")
    }
  }

  test("hllDistinct: dense groups estimate within HLL error, sparse " +
       "groups hit linear counting, partition-invariant") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => ("big", s"tok$i")) ++
      (1 to 30).map(i => ("small", s"word$i"))
    val df = rows.toDF("src", "word")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllDistinct(d, "src", col("word"))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val est = run(df)
    // m=64 -> relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est("big") - 5000) / 5000 < 0.4,
      s"big-group estimate off: ${est("big")}")
    assert(math.abs(est("small") - 30) / 30 < 0.25,
      s"linear-counting estimate off: ${est("small")}")
    assert(run(df.repartition(13)) === est, "estimates must not depend " +
      "on partitioning (integer register state)")
  }

  test("cmSketch: estimates never underestimate, track true counts for " +
       "heavy hitters, read 0-ish for absent words, partition-invariant") {
    import spark.implicits._
    val rows = Seq.fill(300)(("g", "heavy")) ++
      (1 to 100).map(i => ("g", s"rare$i"))
    val df = rows.toDF("src", "word")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val counters = Sketches.cmCounters(d, "src", col("word"))
      Sketches.cmEstimate(counters, Seq("heavy", "rare1", "nothere"))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    }
    val est = run(df)
    assert(est("heavy") >= 300L, "CM never underestimates")
    assert(est("heavy") <= 300L + 100L, s"heavy overshoot: ${est("heavy")}")
    assert(est("rare1") >= 1L && est("rare1") <= 50L)
    assert(est("nothere") <= 40L, s"absent word read: ${est("nothere")}")
    assert(run(df.repartition(9)) === est,
      "counters are integer sums: partition-invariant")
  }

  test("kmvDistinct: exact below k, sane estimate above, partition-" +
       "invariant") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => ("big", s"tok$i")) ++
      (1 to 9).map(i => ("small", s"word$i"))
    val df = rows.toDF("src", "word")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvDistinct(d, "src", col("word"), k = 16)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .map(t => t._1 -> (t._2, t._3)).toMap
    val est = run(df)
    assert(est("small") === ((9L, 9.0)), "below k: exact count")
    assert(est("big")._1 === 16L)
    // k=16 -> relative error ~1/sqrt(14) = 27%; allow wide
    assert(math.abs(est("big")._2 - 2000) / 2000 < 0.8,
      s"big-group estimate off: ${est("big")._2}")
    assert(run(df.repartition(13)) === est, "partition-invariant")
  }

  test("bloom filter: no false negatives, sparse-filter absent probe is " +
       "false, registers merge by OR, partition-invariant") {
    import spark.implicits._
    val words = (1 to 40).map(i => ("a", s"tok$i")) ++
      (1 to 5).map(i => ("b", s"word$i"))
    val df = words.toDF("src", "word")
    def regs(d: org.apache.spark.sql.DataFrame) =
      Sketches.bloomRegisters(d, "src", col("word"))
    // every inserted word must probe true (no false negatives — the
    // Bloom guarantee), in every group it was inserted into
    val inserted = Sketches.bloomContains(regs(df),
        words.map(_._2).distinct)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getBoolean(2)).toMap
    for ((src, w) <- words)
      assert(inserted((src, w)), s"false negative: $src/$w")
    // group b holds 5 words -> <=15 of 1024 bits set: a fixed absent
    // probe hitting all 3 bits is (15/1024)^3 — deterministically false
    // for this corpus (and pinned by this test forever)
    val probe = Sketches.bloomContains(regs(df),
        Seq("tok1", "definitely_absent_probe"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(2), r.getLong(3))).toMap
    assert(probe(("a", "tok1"))._1 && !probe(("a", "definitely_absent_probe"))._1)
    assert(!probe(("b", "tok1"))._1, "tok1 was never inserted into b")
    assert(probe(("b", "tok1"))._2 <= 15L && probe(("b", "tok1"))._2 >= 1L,
      "fill tracks insertions")
    // partition invariance + OR-merge: registers built from two halves
    // and bit_or'd equal the single-pass registers
    val one = regs(df).collect().map(r =>
      (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(regs(df.repartition(7)).collect().map(r =>
      (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap === one,
      "partition-invariant")
    val half = $"word".rlike("[0-4]$")
    val merged = regs(df.filter(half)).unionByName(regs(df.filter(!half)))
      .groupBy($"key", $"idx")
      .agg(expr("bit_or(bits)").as("bits"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged === one, "two partial filters OR-merge to the full one")
  }

  test("MisraGries: exact below k, guaranteed superset above k, " +
       "partition-invariant guarantee") {
    import spark.implicits._
    // below k: the summary IS the distinct set, sorted
    val tiny = Seq("b", "a", "b", "c").toDF("w")
      .agg(graft.functions.MisraGries.mgCandidates($"w", 8).as("c"))
      .collect().head.getSeq[String](0)
    assert(tiny === Seq("a", "b", "c"))
    // above k the decrement/merge paths engage; any item with freq > N/k
    // must survive REGARDLESS of partitioning (the mergeable-summaries
    // bound) — skewed stream: a×50, b×30, 40 singletons, N=120
    val stream = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 40).map(i => s"rare$i")
    for (p <- Seq(1, 7, 32)) {
      val cand = stream.toDF("w").repartition(p)
        .agg(graft.functions.MisraGries.mgCandidates($"w", 4).as("c"))
        .collect().head.getSeq[String](0)
      assert(cand.size <= 4, s"bounded at k (partitions=$p)")
      assert(cand.contains("a"), s"freq 50 > 120/4 must survive (p=$p)")
    }
  }

  test("heavyHitters: equals the exact HAVING answer on skewed and " +
       "uniform streams, any partitioning") {
    import spark.implicits._
    val stream = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 40).map(i => s"rare$i") // N=120; k=4 -> thr 30: only a (50)
    for (p <- Seq(1, 7)) {
      val hh = Sketches.heavyHitters(stream.toDF("w").repartition(p),
          $"w", k = 4)
        .orderBy("item").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(hh === Seq(("a", 50L, 0.416667)), s"partitions=$p")
    }
    // boundary: cnt*k == N is NOT a heavy hitter (strict >)
    val uniform = (1 to 10).flatMap(i => Seq.fill(10)(s"u$i")) // N=100
    assert(Sketches.heavyHitters(uniform.toDF("w"), $"w", k = 10)
      .count() === 0L, "uniform at exactly N/k keeps nothing")
    assert(Sketches.heavyHitters(uniform.toDF("w"), $"w", k = 11)
      .count() === 10L, "k=11 makes every uniform key heavy")
  }

  test("LogHist bucket map: lowerBound inverts bucketIndex, width bounds " +
       "the relative error, small values exact") {
    import graft.functions.LogHist.{bucketIndex, lowerBound}
    val s = 4
    val probes = (1L to 1000L) ++
      Seq(1L << 20, (1L << 20) + 1, Long.MaxValue, Long.MaxValue - 1) ++
      (0 until 500).map(i => math.abs(new scala.util.Random(7 + i).nextLong())
        .max(1L))
    for (x <- probes) {
      val idx = bucketIndex(x, s)
      val lo = lowerBound(idx, s)
      assert(lo <= x, s"x=$x idx=$idx lo=$lo: lower bound must not exceed x")
      // width = lo >> s for the log range; exact (width 1) below 2^s
      val width = if (idx < (1 << s)) 1L else lo >> s
      assert(x - lo < width || (x - lo == 0 && width == 0),
        s"x=$x idx=$idx lo=$lo width=$width: x must lie inside its bucket")
      if (x < (1 << s)) assert(lo === x, "small values map to themselves")
    }
    // indices are monotone in x and bounded by (64-s)*2^s
    val idxs = probes.sorted.map(bucketIndex(_, s))
    assert(idxs === idxs.sorted, "bucket index monotone in value")
    assert(idxs.last < (64 - s) * (1 << s), "index stays inside the array")
  }

  test("logHistQuantiles: differential vs the exact-histogram replay, " +
       "exact below 2^s, rank-error bound, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // two groups: one heavy-tailed (log-uniform-ish), one small-exact
    val big = Seq.fill(2000)(("big",
      math.max(1L, math.pow(10, rnd.nextDouble() * 5).toLong)))
    val small = Seq.fill(300)(("small", (rnd.nextInt(15) + 1).toLong))
    val rows = rnd.shuffle(big ++ small)
    val qs = Seq(0.5, 0.9, 0.99)
    // reference: exact order statistic mapped through the bucket floor
    def ref(vals: Seq[Long], q: Double): Long = {
      val sorted = vals.sorted
      val r = math.ceil(q * vals.size).toLong.toInt
      graft.functions.LogHist.lowerBound(
        graft.functions.LogHist.bucketIndex(sorted(r - 1), 4), 4)
    }
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> (vs.size.toLong, qs.map(q => ref(vs.map(_._2), q)))
    }
    for (p <- Seq(1, 7, 32)) {
      val got = Sketches.logHistQuantiles(
          rows.toDF("g", "v").repartition(p), "g", $"v",
          subBits = 4, qs = qs)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), Seq(r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(got === expected, s"partitions=$p")
    }
    // error contract: estimate <= true quantile < estimate * (1 + 2^-4)
    val bigVals = big.map(_._2).sorted
    for (q <- qs) {
      val est = expected("big")._2(qs.indexOf(q)).toDouble
      val truth = bigVals(math.ceil(q * bigVals.size).toInt - 1).toDouble
      assert(est <= truth && truth < est * (1.0 + 1.0 / 16) + 1,
        s"q=$q est=$est truth=$truth")
    }
    // groups whose values are all < 2^s get EXACT percentiles
    val smallVals = small.map(_._2).sorted
    val exactP50 = smallVals(math.ceil(0.5 * smallVals.size).toInt - 1)
    assert(expected("small")._2.head === exactP50, "small group exact")
  }

  test("kmvOverlap: below-k groups give EXACT set algebra; estimates " +
       "track true overlap on large sets; partition-invariant") {
    import spark.implicits._
    // small groups (< k distinct): everything must be exact
    val small = (Seq.fill(3)(("a", "u1")) ++ Seq(("a", "u2"), ("a", "u3"),
      ("b", "u2"), ("b", "u3"), ("b", "u4"), ("c", "u9"))).toDF("g", "u")
    val rows = Sketches.kmvOverlap(small, "g", $"u", k = 16)
      .orderBy("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.toSeq === Seq(
      ("a", "b", 3.0, 3.0, 4.0, 2.0, 0.5),
      ("a", "c", 3.0, 1.0, 4.0, 0.0, 0.0),
      ("b", "c", 3.0, 1.0, 4.0, 0.0, 0.0)))
    // groups whose value expression is entirely null carry EMPTY
    // sketches: a pair of two such groups has est_union 0 and its
    // jaccard must be NULL (safeDiv rule), never IEEE 0/0 = NaN
    val withNull = Seq(("a", Some("u1")), ("a", Some("u2")),
      ("z1", None), ("z1", None), ("z2", None)).toDF("g", "u")
    val byPair = Sketches.kmvOverlap(withNull, "g", $"u", k = 16)
      .orderBy("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val az = byPair(("a", "z1"))
    assert(az.getDouble(3) === 0.0 && az.getDouble(4) === 2.0 &&
      az.getDouble(6) === 0.0,
      "empty-vs-real pair: union is the real set, jaccard 0")
    val zz = byPair(("z1", "z2"))
    assert(zz.getDouble(4) === 0.0 && zz.getDouble(5) === 0.0,
      "empty-vs-empty: union and inter both 0")
    assert(zz.isNullAt(6), "degenerate 0/0 -> null, not NaN")
    // large overlapping sets: estimate within KMV error of the truth
    val x = (1 to 3000).map(i => ("x", s"user$i"))
    val y = (1501 to 4500).map(i => ("y", s"user$i")) // true J = 1500/4500
    for (p <- Seq(1, 13)) {
      val est = Sketches.kmvOverlap((x ++ y).toDF("g", "u").repartition(p),
          "g", $"u", k = 64)
        .collect().head
      assert(math.abs(est.getDouble(6) - 1.0 / 3) < 0.2,
        s"p=$p jaccard est ${est.getDouble(6)}")
      assert(math.abs(est.getDouble(4) - 4500) / 4500 < 0.4,
        s"p=$p union est ${est.getDouble(4)}")
    }
  }

  test("logHistCdf: exact small-value regime matches cume_dist; " +
       "monotone in value; groups normalized independently") {
    import spark.implicits._
    // values < 2^4 are exact buckets -> cdf == exact step-CDF
    val g1 = Seq(1L, 2L, 2L, 3L, 10L, 15L).map(("g1", _))
    val g2 = Seq(5L, 5L, 5L, 5L).map(("g2", _))
    val df = (g1 ++ g2).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("rid", "g", "v")
    val got = Sketches.logHistCdf(df, "rid", "v", "g")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // g1 exact: P(<=1)=1/6, P(<=2)=3/6, P(<=3)=4/6, P(<=10)=5/6, P(<=15)=1
    assert(got(0L) === math.rint(1.0 / 6 * 1e6) / 1e6)
    assert(got(1L) === 0.5 && got(2L) === 0.5)
    assert(got(3L) === math.rint(4.0 / 6 * 1e6) / 1e6)
    assert(got(4L) === math.rint(5.0 / 6 * 1e6) / 1e6)
    assert(got(5L) === 1.0)
    assert((6L to 9L).forall(got(_) === 1.0), "g2 all-equal -> cdf 1")
    // large-value regime: monotone, ends at 1, within rank tolerance
    val rnd = new scala.util.Random(3)
    val big = (0 until 1000)
      .map(i => (1000L + i, "h", math.max(1L,
        math.pow(10, rnd.nextDouble() * 5).toLong)))
      .toDF("rid", "g", "v")
    val rows = Sketches.logHistCdf(big, "rid", "v", "g")
      .orderBy("v").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq,
      "cdf monotone in value")
    assert(rows.last._2 === 1.0, "max value has cdf 1")
    // cdf never UNDERSTATES the true rank (step-CDF counts the whole
    // bucket at or below x's bucket)
    val vs = rows.map(_._1)
    rows.zipWithIndex.foreach { case ((v, c), i) =>
      val trueRank = vs.count(_ <= v).toDouble / vs.size
      assert(c >= trueRank - 1e-9, s"v=$v cdf=$c < rank $trueRank")
    }
  }

  test("hllSlidingDistinct: every hour equals the from-scratch HLL " +
       "over its trailing slice — including hours where a bucket was " +
       "seen only EARLIER in the window") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00").getTime
    val rnd = new scala.util.Random(17)
    // bursty arrivals with gaps: hour h gets users clustered by h so
    // consecutive windows share some users and not others
    val evs = (0 until 40).flatMap { h =>
      if (h % 7 == 3) Seq.empty // silent hours exercise range gaps
      else (0 until 30).map { i =>
        ("A", new java.sql.Timestamp(base + h * 3600000L + i * 1000L),
          s"user${h / 2}_${rnd.nextInt(50)}")
      }
    }.toDF("k", "ts", "uid")
    val got = Sketches.hllSlidingDistinct(evs, "k", "ts", $"uid",
        trailing = 24)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // reference: re-run the plain per-key estimator over each trailing
    // slice (same register math, built from scratch)
    val hrs = got.keys.toSeq.sorted
    for (h <- hrs) {
      val slice = evs.filter(
        floor(unix_timestamp($"ts") / 3600L).cast("long").between(h - 23, h))
      val want = Sketches.hllDistinct(slice, "k", $"uid")
        .collect().head
      assert((want.getLong(1), want.getDouble(2)) === got(h), s"hour $h")
    }
  }

  test("log_hist SQL registration aggregates like the Column form") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v")
    df.createOrReplaceTempView("lh_vals")
    val viaSql = spark.sql(
      "SELECT log_hist(v, 4) AS h FROM lh_vals").collect().head.getSeq[Long](0)
    val viaCol = df.agg(graft.functions.LogHist.histCounts($"v", 4).as("h"))
      .collect().head.getSeq[Long](0)
    assert(viaSql === viaCol)
    assert(viaSql.sum === 100L, "every input counted once")
  }

  test("captureRecapture: textbook n1*n2/m on half-overlapping " +
       "windows, zero overlap nulls instead of blowing up") {
    import spark.implicits._
    // A sees keys 1..10, B sees 6..15: n1=n2=10, overlap 5 -> LP 20
    // against 15 actual (the estimator's known small-sample bias)
    val rows = ((1 to 10).map(k => (k.toLong, "a")) ++
      (6 to 15).map(k => (k.toLong, "b"))).toDF("k", "tag")
    val g = Sketches.captureRecapture(rows, "k",
      col("tag") === "a", col("tag") === "b").collect().head
    assert(g.getLong(0) === 10L && g.getLong(1) === 10L &&
      g.getLong(2) === 5L)
    assert(g.getDouble(3) === 20.0 && g.getLong(4) === 15L)
    assert(math.abs(g.getDouble(5) - (20.0 - 15.0) / 15.0) < 1e-6)
    val disjoint = Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
    val g2 = Sketches.captureRecapture(disjoint, "k",
      col("tag") === "a", col("tag") === "b").collect().head
    assert(g2.getLong(2) === 0L && g2.isNullAt(3) && g2.isNullAt(5))
  }
}
