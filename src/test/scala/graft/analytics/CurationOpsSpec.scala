package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The round-7 curation/ops additions: bounded per-group top-k,
  * cluster coreset, snapshot diff, rate anomaly, adaptive length gate,
  * Zipf fit. */
class CurationOpsSpec extends SparkTestBase {

  test("TopKBy: bounded at k, ascending (score, id), ties by id, " +
       "partition-invariant") {
    import spark.implicits._
    val rows = Seq((3.0, 30L), (1.0, 10L), (2.0, 20L), (1.0, 5L),
      (4.0, 40L), (2.0, 15L))
    for (p <- Seq(1, 4)) {
      val top = rows.toDF("s", "id").repartition(p)
        .agg(graft.functions.TopKBy.topKMin($"s", $"id", 3).as("t"))
        .select(posexplode($"t"))
        .select($"col.score", $"col.id")
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
      assert(top === Seq((1.0, 5L), (1.0, 10L), (2.0, 15L)),
        s"partitions=$p")
    }
    // below k the aggregate returns the whole group, still sorted
    val all = Seq((2.0, 2L), (1.0, 1L)).toDF("s", "id")
      .agg(graft.functions.TopKBy.topKMin($"s", $"id", 10).as("t"))
      .select(size($"t")).head().getInt(0)
    assert(all === 2)
    // duplicate (score, id) rows keep their multiplicity — exactly what
    // row_number() OVER (ORDER BY s, id) <= k would keep
    for (p <- Seq(1, 3)) {
      val dup = Seq((1.0, 5L), (1.0, 5L), (3.0, 7L)).toDF("s", "id")
        .repartition(p)
        .agg(graft.functions.TopKBy.topKMin($"s", $"id", 2).as("t"))
        .select(posexplode($"t")).select($"col.score", $"col.id")
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
      assert(dup === Seq((1.0, 5L), (1.0, 5L)), s"partitions=$p")
    }
  }

  test("TopKBy integral-id widening: int/short ids aggregate through " +
       "the same bigint state (order-preserving), and operators that " +
       "emit ids restore the caller's type; string ids fall back to " +
       "the window instead of failing analysis") {
    import spark.implicits._
    // int ids ride TopKBy directly — same keeps as the long form
    val ints = Seq((3.0, 30), (1.0, 10), (2.0, 20), (1.0, 5))
      .toDF("s", "id")
    val keep = ints.agg(graft.functions.TopKBy.topKMin($"s", $"id", 2)
        .as("t"))
      .select(posexplode($"t")).select($"col.score", $"col.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(keep === Seq((1.0, 5L), (1.0, 10L)))
    // clusterCoreset over INT vec_ids: analyzes, and the emitted
    // vec_id column keeps IntegerType (cast back from the bigint state)
    val emb = (0 until 40).map { i =>
      val base = if (i < 20) 1.0f else -1.0f
      (i, Array(base + i * 0.001f, base, base, base))
    }.toDF("vec_id", "embedding")
    val cs = Cluster.clusterCoreset(emb, "vec_id", "embedding",
      k = 2, iters = 1, m = 3)
    assert(cs.schema("vec_id").dataType ===
      org.apache.spark.sql.types.IntegerType,
      "integral ids must round-trip through TopKBy at their own type")
    assert(cs.count() === 6)
    // marginMining over STRING ids: the window fallback must analyze
    // and run (the TopKBy form would fail its integral-state check)
    val semb = (0 until 12).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (f"v$i%02d", Array(base + i * 0.01f, base, base, base))
    }.toDF("vec_id", "embedding")
    val mm = Similarity.marginMining(semb, "vec_id", "embedding",
      srcPred = col("vec_id") < "v06", k = 2, minMargin = 0.0)
    assert(mm.count() > 0, "string-id marginMining must run via window")
  }

  test("clusterCoreset equals the row_number window reference") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // two tight clusters of 30 points each in 4-d
    val vecs = (0 until 60).map { i =>
      val base = if (i < 30) 1.0f else -1.0f
      (i.toLong, Array(base + i * 0.001f, base, base, base))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Cluster.clusterCoreset(emb, "vec_id", "embedding",
        k = 2, iters = 2, m = 5)
      .orderBy("cluster", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val ref = Cluster.kmeansAssign(emb, "vec_id", "embedding",
        k = 2, iters = 2)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"cluster").orderBy($"dist2", $"vec_id"))
        .cast("int"))
      .filter($"rank" <= 5)
      .select($"cluster", $"rank", $"vec_id", $"dist2")
      .orderBy("cluster", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got === ref)
    assert(got.nonEmpty && got.forall(_._2 <= 5), "ranks capped at m")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val got = Dedup.snapshotDiff(old, neu, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("snapshotDiff: presence is keyed on the id, so a null text is a " +
       "present-but-changed row, never a phantom add/remove") {
    import spark.implicits._
    val old = Seq((1L, null: String), (2L, "b"), (3L, null: String),
      (4L, "d")).toDF("id", "text")
    val neu = Seq((1L, "x"), (2L, null: String), (3L, null: String))
      .toDF("id", "text")
    val got = Dedup.snapshotDiff(old, neu, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    // null content never compares equal (SQL three-valued =), so even
    // null->null is `changed`; id 4 is the only true removal
    assert(got === Seq((1L, "changed"), (2L, "changed"),
      (3L, "changed"), (4L, "removed")))
  }

  test("rateAnomaly: z-scores against the trailing window, gated on " +
       "history depth and variance") {
    import spark.implicits._
    // type A: 14 steady hours at 10, then a spike of 100
    // type B: only 3 hours — never enough history for a z
    val rows =
      (0 until 14).map(h => ("A", h, 10)) ++ Seq(("A", 14, 100)) ++
      (0 until 3).map(h => ("B", h, 5))
    val events = rows.toDF("event_type", "h", "n")
      .select($"event_type", $"h", explode(array_repeat(lit(1), $"n")))
      .select($"event_type",
        timestamp_seconds($"h".cast("long") * 3600L).as("ts"))
    val out = Stats.rateAnomaly(events, "event_type", "ts",
        trailing = 24, minHist = 12)
      .orderBy("event_type", "hr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
    val a = out.filter(_._1 == "A")
    val byHr = a.map(r => r._2 -> r).toMap
    assert(byHr(11L)._4.isEmpty, "under minHist: no z")
    assert(byHr(13L)._4.isEmpty, "zero variance: gated")
    assert(byHr(14L)._4.isEmpty && !byHr(14L)._5,
      "spike over a zero-variance window stays gated (sd=0)")
    assert(out.filter(_._1 == "B").forall(r => r._4.isEmpty && !r._5),
      "3 hours of history never clears minHist")
    // now a window with real variance: alternate 10/12 for 24h, then 40
    val rows2 = (0 until 24).map(h => ("C", h, if (h % 2 == 0) 10 else 12)) ++
      Seq(("C", 24, 40))
    val ev2 = rows2.toDF("event_type", "h", "n")
      .select($"event_type", $"h", explode(array_repeat(lit(1), $"n")))
      .select($"event_type",
        timestamp_seconds($"h".cast("long") * 3600L).as("ts"))
    val c24 = Stats.rateAnomaly(ev2, "event_type", "ts").collect()
      .filter(r => r.getLong(1) == 24L).head
    // trailing mean 11, sd 1 -> z = 29
    assert(c24.getDouble(4) === 29.0 && c24.getBoolean(5))
  }

  test("lengthPercentileGate: hand-computed per-group thresholds, " +
       "keep inside [p05, p95]") {
    import spark.implicits._
    val docs = ((1 to 20).map(i => (i.toLong, "g1", i.toLong * 10)) ++
      Seq((100L, "g2", 5L), (101L, "g2", 6L), (102L, "g2", 7L)))
      .toDF("id0", "grp0", "len")
    val out = Selection.lengthPercentileGate(docs, "id0", "len", "grp0",
        lo = 0.05, hi = 0.95)
      .orderBy("id0").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    // g1 lengths 10..200: p05 = 10 + 0.05*19*10 = 19.5, p95 = 190.5
    val g1 = out.filter(_._1 <= 20L)
    assert(g1.head._2 === 19.5 && g1.head._3 === 190.5)
    assert(g1.count(_._4) === 18, "10 and 200 fall outside")
    // g2 lengths 5,6,7: p05 = 5.1, p95 = 6.9 -> only 6 survives
    val g2 = out.filter(_._1 >= 100L)
    assert(g2.map(_._4).toSeq === Seq(false, true, false))
  }

  test("zipfSlope: a perfect 1/rank law fits slope -1 exactly") {
    import spark.implicits._
    // freqs 12/6/4/3 for ranks 1..4: ln f = ln 12 - 1 * ln rank
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfSlope(docs, "doc_id", "text").head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === -1.0)
    assert(r.getDouble(2) === math.rint(math.log(12.0) * 1e6) / 1e6)
  }

  test("cusumShift: window identity equals the clamped recurrence " +
       "replayed locally; a sustained level shift alarms where single " +
       "hours stay under the pointwise radar") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 40 quiet hours at 10±1, then 20 hours at 13 — each shifted hour is
    // under ~2 sigma alone; the cumulative sum crosses 4*sd quickly
    val hourly = (0 until 40).map(h => h -> (10 + (h % 3 - 1))) ++
      (40 until 60).map(h => h -> 13)
    val evs = hourly.flatMap { case (h, n) =>
      (0 until n).map(i =>
        (h.toLong * 100 + i, new java.sql.Timestamp(
          base + h * 3600000L + i * 1000L), "A"))
    }.toDF("event_id", "ts", "event_type")
    val got = Stats.cusumShift(evs, "event_type", "ts")
      .orderBy("hr").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    // local replay of S_t = max(0, S_{t-1} + x - mu - 0.5 sd)
    val xs = hourly.map(_._2.toDouble)
    val mu = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.size)
    var s = 0.0
    val want = xs.map { x => s = math.max(0.0, s + x - mu - 0.5 * sd); s }
    got.map(_._2).zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-6, s"hour $i: $g vs $w")
    }
    val firstAlarm = got.indexWhere(_._3)
    assert(firstAlarm >= 40 && firstAlarm <= 45,
      s"alarm soon after the shift, got hour $firstAlarm")
    assert(got.take(40).forall(!_._3), "no alarms during the quiet period")
    // silent hours are ZERO samples, not missing ones: hour 2 has no
    // events yet must appear, carry c=0, and enter mu/sd and the sum
    val evs2 = Seq((0, 5), (1, 5), (3, 9)).flatMap { case (h, n) =>
      (0 until n).map(i => (h.toLong * 1000 + i, new java.sql.Timestamp(
        base + h * 3600000L + i * 1000L), "B"))
    }.toDF("event_id", "ts", "event_type")
    val g2 = Stats.cusumShift(evs2, "event_type", "ts")
      .orderBy("hr").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(g2.length === 4, "silent hour densified in")
    assert(g2(2)._1 === 0L, "hour 2 carries count 0")
    val xs2 = Seq(5.0, 5.0, 0.0, 9.0)
    val mu2 = xs2.sum / 4
    val sd2 = math.sqrt(xs2.map(x => (x - mu2) * (x - mu2)).sum / 4)
    var s2 = 0.0
    val want2 = xs2.map { x => s2 = math.max(0.0, s2 + x - mu2 - 0.5 * sd2); s2 }
    g2.map(_._2).zip(want2).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"$g vs $w")
    }
  }

  test("transitionMatrix: hand-pinned counts and probabilities; " +
       "sequences never cross users; ties break on event id") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, 1L, "a", t(1)), (2L, 1L, "b", t(2)), (3L, 1L, "a", t(3)),
      (4L, 1L, "b", t(4)),
      (5L, 2L, "a", t(1)), (6L, 2L, "a", t(2)),
      // same-ts tie for user 3: event_id order decides c->d
      (7L, 3L, "c", t(9)), (8L, 3L, "d", t(9))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.transitionMatrix(ev, "user_id", "event_type", "ts",
        "event_id")
      .orderBy("cur", "next").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // user 1: a->b, b->a, a->b; user 2: a->a; user 3: c->d (tie by id)
    // cur=a has 3 outgoing: p(a->b)=2/3, p(a->a)=1/3
    val m = got.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.length === 4)
    assert(m(("a", "b")) === ((2L, 0.666667)))
    assert(m(("a", "a")) === ((1L, 0.333333)))
    assert(m(("b", "a")) === ((1L, 1.0)) && m(("c", "d")) === ((1L, 1.0)))
    assert(!m.contains(("b", "c")) && !m.contains(("d", "a")),
      "no cross-user transitions")
  }

  test("twap: hand-computed holding-time weights; burst does not " +
       "dominate the day; last observation holds to midnight") {
    import spark.implicits._
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // level 10.0 from 00:00, burst of 3x 100.0 during one minute at
    // 12:00-12:03, back to 10.0 from 12:03: time-weighted stays near 10
    val ev = Seq(
      (1L, "A", t(0, 0), 10.0),
      (2L, "A", t(12, 0), 100.0), (3L, "A", t(12, 1), 100.0),
      (4L, "A", t(12, 2), 100.0),
      (5L, "A", t(12, 3), 10.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val got = Events.twap(ev, "event_type", "ts", "value", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length === 1)
    val (_, day, n, tw) = got.head
    assert(day === "2024-01-01" && n === 5L)
    // exact: 10*(12h) + 100*(3min) + 10*(11h57m) over 24h
    val total = 24.0 * 60
    val want = (10.0 * (12 * 60) + 100.0 * 3 + 10.0 * (11 * 60 + 57)) / total
    assert(math.abs(tw - want) < 1e-6, s"$tw vs $want")
    val rowAvg = (10.0 + 100.0 * 3 + 10.0) / 5
    assert(tw < 12 && rowAvg > 40,
      "row-average is burst-dominated; TWAP is not")
  }

  test("abLift: hand-computed rates, lift and pooled z; a user's many " +
       "events count once") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // cohort = user % 2. A (even): users 2,4,6,8 — 2 convert (user 2
    // twice: still one conversion). B (odd): users 1,3,5,7,9 — 4 convert.
    val ev = (Seq((2L, "purchase"), (2L, "purchase"), (4L, "purchase"),
      (6L, "view"), (8L, "view"),
      (1L, "purchase"), (3L, "purchase"), (5L, "purchase"),
      (7L, "purchase"), (9L, "view"))
      .zipWithIndex.map { case ((u, tp), i) => (i.toLong, u, tp, t(i)) })
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.abLift(ev, "user_id", "event_type", "purchase",
      col("user_id") % 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 5L, 2L, 4L)))
    assert(r.getDouble(4) === 0.5 && r.getDouble(5) === 0.8)
    assert(r.getDouble(6) === 0.6, "lift = 0.8/0.5 - 1")
    // pooled p = 6/9; z = (0.8-0.5)/sqrt(p(1-p)(1/4+1/5))
    val p = 6.0 / 9
    val z = (0.8 - 0.5) / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 5))
    assert(math.abs(r.getDouble(7) - z) < 1e-6)
  }

  test("kaplanMeier: hand-computed curve with right-censoring; naive " +
       "lifetime averaging would understate survival") {
    import spark.implicits._
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // feed spans days 1..5 (gmax = day 5)
    //  u1: days 1..2  -> lifetime 1, churned
    //  u2: days 1..3  -> lifetime 2, churned
    //  u3: days 1..5  -> lifetime 4, CENSORED (active at cutoff)
    //  u4: day 2 only -> lifetime 0, churned
    //  u5: days 3..5  -> lifetime 2, CENSORED
    val ev = Seq(
      (1L, t(1)), (1L, t(2)),
      (2L, t(1)), (2L, t(3)),
      (3L, t(1)), (3L, t(5)),
      (4L, t(2)),
      (5L, t(3)), (5L, t(5))
    ).zipWithIndex.map { case ((u, ts), i) => (i.toLong, u, ts) }
      .toDF("event_id", "user_id", "ts")
    val got = Events.kaplanMeier(ev, "user_id", "ts")
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // t=0: risk 5, churn 1 -> S = 4/5 = .8
    // t=1: risk 4, churn 1 -> S = .8 * 3/4 = .6
    // t=2: risk 3 (u2 churn, u5 censored) churn 1 -> S = .6 * 2/3 = .4
    // t=4: u3 censored, no churn -> no row
    assert(got.toSeq === Seq(
      (0L, 5L, 1L, 0.8), (1L, 4L, 1L, 0.6), (2L, 3L, 1L, 0.4)))
  }

  test("bootstrapMeanCI: CI brackets the true mean, is deterministic " +
       "across partitionings, and narrows with sample size") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val small = (0 until 50).map(i => ("s", i.toLong, 10.0 + rnd.nextGaussian()))
    val large = (0 until 2000).map(i => ("l", 1000L + i, 10.0 + rnd.nextGaussian()))
    val df = (small ++ large).toDF("g", "rid", "x")
    def run(p: Int) = Stats.bootstrapMeanCI(df.repartition(p), "g", "x",
        "rid", b = 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val a = run(1)
    assert(run(13) === a, "hash-seeded weights: partition-invariant")
    for ((g, (n, mean, clo, chi)) <- a) {
      assert(clo < mean && mean < chi, s"$g: CI brackets the mean")
      assert(clo < 10.2 && chi > 9.8, s"$g: CI covers the truth region")
    }
    val widthS = a("s")._4 - a("s")._3
    val widthL = a("l")._4 - a("l")._3
    assert(widthL < widthS, s"more data -> tighter CI ($widthL vs $widthS)")
    // a group whose values are ALL null produces no bootstrap
    // replicates — the group row must still appear (n=0, null mean,
    // null bounds), as the oracle's plain GROUP BY keeps it
    val withNull = df.select($"g", $"rid", $"x")
      .union(Seq(("empty", 9999L), ("empty", 9998L))
        .toDF("g", "rid").withColumn("x", lit(null).cast("double"))
        .select($"g", $"rid", $"x"))
    val rows = Stats.bootstrapMeanCI(withNull, "g", "x", "rid", b = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.contains("empty"), "all-null group row is kept")
    val e = rows("empty")
    assert(e.getLong(1) === 0L && e.isNullAt(2) && e.isNullAt(3) &&
      e.isNullAt(4), "n=0, null mean and bounds")
  }

  test("seasonalAnomaly: a quiet-hours spike flags against its own " +
       "hour-of-day baseline while the daily peak does not; short " +
       "history gates") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    var id = 0L
    def burst(day: Int, hod: Int, n: Int): Seq[(Long, java.sql.Timestamp, String)] =
      (0 until n).map { i =>
        id += 1
        (id, new java.sql.Timestamp(
          base + (day * 24L + hod) * 3600000L + i * 1000L), "A")
      }
    // 20 days: hod 3 runs at 10/hr, hod 12 runs at 100/hr; on day 19
    // hod 3 spikes to 30 (3x ITS baseline, far below the daily peak)
    val evs = ((0 until 20).flatMap { d =>
      burst(d, 3, if (d == 19) 30 else 10) ++ burst(d, 12, 100)
    }).toDF("event_id", "ts", "event_type")
    val got = Stats.seasonalAnomaly(evs, "event_type", "ts",
        factor = 2.0, minDays = 14)
      .collect()
      .map(r => ((r.getLong(1) - base / 3600000L), r.getLong(2),
        Option(r.get(6)).map(_.asInstanceOf[Double]), r.getBoolean(7)))
    val flagged = got.filter(_._4)
    assert(flagged.map(x => (x._1 % 24, x._2)).toSeq === Seq((3L, 30L)),
      s"exactly the quiet-hours spike flags: ${flagged.toSeq}")
    // the daily peak (100 at hod 12) never flags: ratio vs ITS median is 1
    assert(got.filter(x => x._1 % 24 == 12).forall(!_._4))
    // a global z-score would rank the spike (30) far below the peak's
    // ordinary hours (100) — the seasonality point
    assert(got.find(x => x._1 == 19 * 24 + 3).get._3.get === 3.0)
    // short history: with minDays above the day count, nothing flags
    assert(Stats.seasonalAnomaly(evs, "event_type", "ts", minDays = 99)
      .filter(col("seasonal")).count() === 0L)
  }

  test("DataAudit: injected violations surface in the right rows with " +
       "exact counts; clean tables pass") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val childBad = Seq(1L, 2L, 9L, 9L).toDF("fk") // one orphan key, twice
    val dup = Seq(1L, 1L, 2L).toDF("k")           // pk violated
    val nully = Seq(Some("a"), None, None, Some("b")).toDF("s")
    val ranged = Seq(0.5, 1.0, 50.0, 51.0).toDF("x")
    val statuses = Seq("O", "F", "X").toDF("st")
    val rep = DataAudit.report(Seq(
      DataAudit.rowCount(parent, "parent", minRows = 10),
      DataAudit.rowCount(parent, "parent_ok", minRows = 3),
      DataAudit.pkUnique(dup, "dup", "k"),
      DataAudit.fkOrphans(childBad, parent, "child", "fk", "pk"),
      DataAudit.nullRate(nully, "nully", "s", maxRate = 0.25),
      DataAudit.valueRange(ranged, "ranged", "x", lo = 1, hi = 50),
      DataAudit.acceptedValues(statuses, "statuses", "st", Seq("O", "F"))))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(rep("parent") === ((3.0, 0L, false)), "row floor missed")
    assert(rep("parent_ok") === ((3.0, 0L, true)), "clean floor passes")
    assert(rep("dup") === ((1.0, 1L, false)), "one duplicate row beyond pk")
    assert(rep("child") === ((2.0, 2L, false)), "both orphan rows counted")
    assert(rep("nully") === ((0.5, 2L, false)), "null rate over ceiling")
    assert(rep("ranged") === ((2.0, 2L, false)), "0.5 and 51 out of range")
    assert(rep("statuses") === ((1.0, 1L, false)), "X not accepted")
  }

  test("topJourneys: hand-pinned trigram paths; incomplete tails drop; " +
       "no cross-user paths; deterministic tie order") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, 1L, "a", t(1)), (2L, 1L, "b", t(2)), (3L, 1L, "c", t(3)),
      (4L, 1L, "a", t(4)), // user 1: a>b>c, b>c>a
      (5L, 2L, "a", t(1)), (6L, 2L, "b", t(2)), (7L, 2L, "c", t(3)),
      (8L, 3L, "x", t(1)), (9L, 3L, "y", t(2)) // too short: no trigram
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.topJourneys(ev, "user_id", "event_type", "ts",
        "event_id", n = 3, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "a > b > c", 2L), (2, "b > c > a", 1L)),
      s"got ${got.toSeq}")
  }

  test("kAnonymity: classes under k flag for suppression, classes at " +
       "or over k pass; the boundary is strict") {
    import spark.implicits._
    val rows = Seq.fill(10)(("en", "webA")) ++ Seq.fill(9)(("en", "webB")) ++
      Seq.fill(1)(("de", "webA"))
    val got = DataAudit.kAnonymity(rows.toDF("lang", "src"), k = 10L,
        "lang", "src")
      .orderBy("lang", "src").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("de", "webA", 1L, true),
      ("en", "webA", 10L, false), // exactly k is anonymous
      ("en", "webB", 9L, true)))  // k-1 is not
  }

  test("lDiversity: a k-large homogeneous class still suppresses (the " +
       "homogeneity attack), null sensitive values add no diversity, " +
       "either bound failing flags") {
    import spark.implicits._
    val rows =
      Seq.fill(10)(("webA", "en")) ++                    // size ok, l=1
      (Seq.fill(8)(("webB", "en")) ++ Seq(("webB", "de"),
        ("webB", "fr"), ("webB", "it"))) ++              // size 11, l=4
      Seq.fill(4)(("webC", "en")) ++ Seq(("webC", "de"),
        ("webC", "fr")) ++                               // l ok, size 6 < 10
      (Seq.fill(8)(("webD", null: String)) ++
        Seq(("webD", "en"), ("webD", "de")))             // nulls: l=2 < 3
    val got = DataAudit.lDiversity(rows.toDF("src", "lang"),
        k = 10L, l = 3L, "lang", "src")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("webA", 10L, 1L, true),
      ("webB", 11L, 4L, false),
      ("webC", 6L, 3L, true),
      ("webD", 10L, 2L, true)))
  }

  test("attribution: first/last picks are deterministic under ties, " +
       "window excludes stale and future touches, no-touch conversions " +
       "keep a null-share row") {
    import spark.implicits._
    def t(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      // user 1: clicks on day 2 (two at the SAME ts: id tiebreak), day 9;
      // purchase day 9 12:00 -> window [day 2 12:00, day 9 12:00]
      (10L, 1L, "click", t(2, 13), 0.0), (11L, 1L, "click", t(2, 13), 0.0),
      (12L, 1L, "click", t(9, 1), 0.0),
      (13L, 1L, "click", t(1, 1), 0.0),  // stale: before the window
      (14L, 1L, "click", t(9, 18), 0.0), // future: after the purchase
      (20L, 1L, "purchase", t(9, 12), 30.0),
      // user 2: purchase with no clicks at all
      (21L, 2L, "purchase", t(5, 5), 9.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "value", "purchase", "click", windowDays = 7)
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      (20L, 3L, Some(10L), Some(12L), Some(10.0)),
      (21L, 0L, None, None, None)))
  }

  test("attribution maxTouchesPerWindow cap: latest-N-per-bucket kept, " +
       "last_touch stays exact, n_touches becomes a lower bound, " +
       "under-cap users unchanged") {
    import spark.implicits._
    def t(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // buckets are EPOCH-aligned 7-day spans: floor(19726/7) = 2818
    // starts 2024-01-04, so days 4..10 share one bucket. user 1: five
    // clicks on days 4..8 (one bucket), purchase day 8 12:00 — all
    // five in-window. user 2: two clicks, under cap.
    val ev = Seq(
      (10L, 1L, "click", t(4, 1), 0.0), (11L, 1L, "click", t(5, 1), 0.0),
      (12L, 1L, "click", t(6, 1), 0.0), (13L, 1L, "click", t(7, 1), 0.0),
      (14L, 1L, "click", t(8, 1), 0.0),
      (20L, 1L, "purchase", t(8, 12), 50.0),
      (30L, 2L, "click", t(5, 2), 0.0), (31L, 2L, "click", t(6, 2), 0.0),
      (40L, 2L, "purchase", t(7, 4), 8.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    def run(cap: Int) =
      Events.attribution(ev, "user_id", "event_type", "ts", "event_id",
          "value", "purchase", "click", windowDays = 7,
          maxTouchesPerWindow = cap)
        .orderBy("conv_id").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // capped at 3: user 1 keeps the LATEST three clicks (12, 13, 14) —
    // n_touches drops 5 -> 3, first_touch shifts to 12, last stays 14;
    // user 2 is under cap and byte-identical to the exact path
    assert(run(3).toSeq === Seq((20L, 3L, 12L, 14L), (40L, 2L, 30L, 31L)))
    assert(run(Int.MaxValue).toSeq ===
      Seq((20L, 5L, 10L, 14L), (40L, 2L, 30L, 31L)))
    // documented approximation boundary: a touch AFTER the conversion
    // (but in the same bucket) competes for the kept slots, so even
    // last_touch can miss under cap — pin the behavior so the scaladoc
    // claim and the code can't drift apart
    val late = Seq(
      (50L, 9L, "click", t(4, 2), 0.0),      // in-window
      (60L, 9L, "purchase", t(5, 0), 5.0),
      (51L, 9L, "click", t(6, 0), 0.0)       // after purchase, same bucket
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val capped1 = Events.attribution(late, "user_id", "event_type", "ts",
        "event_id", "value", "purchase", "click", windowDays = 7,
        maxTouchesPerWindow = 1)
      .collect().head
    assert(capped1.getLong(3) === 0L && capped1.isNullAt(4),
      "cap=1 keeps only the post-conversion click: in-window set empty")
  }

  test("timeToConvert: hand-computed percentiles over converting users " +
       "only; purchase-before-view users do not convert") {
    import spark.implicits._
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, "view", t(1, 0)), (1L, "purchase", t(1, 10)),   // 10 min
      (2L, "view", t(2, 0)), (2L, "purchase", t(2, 20)),   // 20 min
      (3L, "view", t(3, 0)), (3L, "purchase", t(4, 0)),    // 60 min
      (4L, "purchase", t(5, 0)), (4L, "view", t(6, 0)),    // wrong order
      (5L, "view", t(7, 0))                                // never buys
    ).zipWithIndex.map { case ((u, tp, ts), i) => (i.toLong, u, tp, ts) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.timeToConvert(ev, "user_id", "event_type", "ts",
      "view", "purchase").collect().head
    assert(r.getLong(0) === 3L, "users 4 and 5 do not convert")
    assert(r.getDouble(1) === 20.0, "median of 10/20/60")
    // p90 interpolates between 20 and 60: 20 + 0.8*(60-20) = 52
    assert(r.getDouble(2) === 52.0)
  }

  test("madOutliers: hand-computed modified z, spike flagged where " +
       "mean/sigma z would hide it, zero-MAD group all-false") {
    import spark.implicits._
    // g1: 1..9 plus a 1000.0 spike. med = 5.5, |x-med| sorted gives
    // mad = 2.5; rz(1000) = 0.6745*994.5/2.5 = 268.3 -> outlier.
    // Classic z would be ~3.0 on this group (sigma ~315 inflated by
    // the spike itself) — the robustness point.
    val g1 = (1 to 9).map(i => (i.toLong, "g1", i.toDouble)) :+
      (10L, "g1", 1000.0)
    // g2: constant -> mad 0 -> no flags, null rz
    val g2 = (11 to 15).map(i => (i.toLong, "g2", 7.0))
    val out = Stats.madOutliers((g1 ++ g2).toDF("eid", "grp", "v"),
        "eid", "v", "grp")
      .orderBy("id").collect()
    val spike = out.find(_.getLong(0) == 10L).get
    assert(spike.getDouble(3) === 5.5 && spike.getDouble(4) === 2.5)
    assert(spike.getDouble(5) === math.rint(0.6745 * 994.5 / 2.5 * 1e6) / 1e6)
    assert(spike.getBoolean(6), "spike must be flagged")
    assert(out.filter(_.getString(1) == "g1").count(_.getBoolean(6)) === 1,
      "only the spike flags in g1")
    val g2rows = out.filter(_.getString(1) == "g2")
    assert(g2rows.forall(r => r.isNullAt(5) && !r.getBoolean(6)),
      "zero-MAD group: null rz, no flags")
  }

  test("funnel: ordered semantics — purchase before view does NOT " +
       "count; rates hand-pinned") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "view", t(1)), (2L, "click", t(2)),           // no purchase
      (3L, "purchase", t(1)), (3L, "view", t(2)),        // wrong order
      (3L, "click", t(3)),
      (4L, "click", t(1)), (4L, "view", t(2)),           // click before view
      (5L, "view", t(5))
    ).toDF("user_id", "event_type", "ts")
    val f = Events.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // views: users 1,2,3,4,5 = 5. clicks after view: 1,2,3 (user 4's
    // click precedes their view) = 3. purchases after that click: 1
    // (user 3's only purchase was before everything) = 1.
    assert(f.toSeq === Seq(
      (1, "view", 5L, 1.0, 1.0),
      (2, "click", 3L, 0.6, 0.6),
      (3, "purchase", 1L, math.rint(1.0 / 3 * 1e6) / 1e6, 0.2)))
  }

  test("cohortRetention: hand-pinned triangle, multi-visit days count " +
       "once") {
    import spark.implicits._
    def t(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (1L, t(1, 1)), (1L, t(1, 9)), (1L, t(2, 1)),  // day-1 cohort, back day 2
      (2L, t(1, 5)),                                 // day-1 cohort, never back
      (3L, t(2, 3)), (3L, t(4, 3))                   // day-2 cohort, back day 4
    ).toDF("user_id", "ts")
    val r = Events.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_day", "day_offset").collect()
      .map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2),
        x.getLong(3), x.getDouble(4)))
    assert(r.toSeq === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0),
      ("2024-01-02", 2, 1L, 1L, 1.0)))
  }

  test("lagFeatures: lags shift by rank, leading rows keep nulls, the " +
       "trailing mean divides by the ACTUAL window row count, " +
       "pct_change guards a zero previous value") {
    import spark.implicits._
    val s = ((1 to 9).map(d => ("k", java.sql.Date.valueOf(
        f"2024-01-$d%02d"), d.toLong)) :+
      ("z", java.sql.Date.valueOf("2024-01-01"), 0L) :+
      ("z", java.sql.Date.valueOf("2024-01-02"), 4L))
      .toDF("key", "day", "n")
    val got = Events.lagFeatures(s, "key", "day", "n")
      .orderBy("key", "day").collect()
    val k3 = got(2) // key k, day 3
    assert(k3.getLong(3) === 2L && k3.isNullAt(4), "lag_1=2, lag_7 null")
    assert(k3.getDouble(5) === 2.0, "ma_7 over 3 actual rows = (1+2+3)/3")
    assert(k3.getDouble(6) === 0.5, "3/2 - 1")
    val k8 = got(7) // day 8: lag_7 = day 1 value
    assert(k8.getLong(4) === 1L)
    assert(got(0).isNullAt(3) && got(0).isNullAt(6), "leading row nulls")
    // z day 2: previous value is 0 -> pct_change null, not a throw
    val z2 = got(10)
    assert(z2.getLong(3) === 0L && z2.isNullAt(6))
  }

  test("abandonment: conversion inside the window clears the view, " +
       "outside-or-absent abandons it, an EARLIER purchase never " +
       "rescues a later view") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val ev = Seq(
      (10L, 1L, "view", t("10:00")), (11L, 1L, "purchase", t("10:15")),
      (12L, 1L, "view", t("11:00")), // nothing within 30m
      (13L, 1L, "view", t("11:50")), (14L, 1L, "purchase", t("12:40")),
      (20L, 2L, "purchase", t("09:00")), // BEFORE the view: no rescue
      (21L, 2L, "view", t("09:30")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.abandonment(ev, "user_id", "ts", "event_id",
        "view", "purchase", windowMinutes = 30)
      .orderBy("user").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, math.round(2.0 / 3.0 * 1e6) / 1e6),
      (2L, 1L, 1L, 1.0)))
  }

  test("freshness: staleness against the FEED max, hours_active vs " +
       "the slice's own span, boundary-crossing minute arithmetic") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val ev = Seq(
      ("a", t("00:10:00")), ("a", t("01:20:00")), ("a", t("03:30:00")),
      ("b", t("02:10:30")))
      .toDF("k", "ts")
    val got = DataAudit.freshness(ev, "k", "ts")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      // a IS the feed max: staleness 0; hours {0,1,3} of span 0..3
      ("a", 0L, 3L, 4L, 0.75),
      // b last 02:10:30 vs max 03:30:00 -> 80 minute crossings;
      // span hour2..hour3 = 2, one active
      ("b", 80L, 1L, 2L, 0.5)))
  }

  test("benford: digits come off the quantized integer, non-positive " +
       "amounts are excluded, all nine digits emit, the reference " +
       "probabilities pin") {
    import spark.implicits._
    // digits: 1.00->"100"->1, 12.34->1, 199.9->1, 2.5->2; zero/neg out
    val df = Seq(1.00, 12.34, 199.9, 2.5, 0.0, -7.0).toDF("amt")
    val got = DataAudit.benford(df, "amt").orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.length === 9)
    assert(got(0) === ((1L, 3L, 0.75, 0.30103)))
    assert(got(1)._2 === 1L && got(1)._3 === 0.25)
    assert(got.drop(2).forall(r => r._2 === 0L && r._3 === 0.0),
      "digits 3..9 emit zero rows, not missing rows")
  }

  test("reconcile: a consistent parent passes, a two-cent drift flags " +
       "at one-cent tolerance, childless parents count once in their " +
       "own check and never as mismatches") {
    import spark.implicits._
    val parents = Seq((1L, 10.0), (2L, 5.0), (3L, 7.0))
      .toDF("pk", "total")
    val children = Seq((1L, 4.0), (1L, 6.0), (2L, 5.02))
      .toDF("ck", "amt")
    val got = DataAudit.reconcile(parents, children, "t",
        "pk", "ck", "total", col("amt"))
      .orderBy("chk").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("amount_reconcile:total", 1L, false), // order 2: 5.02 vs 5.00
      ("childless:pk", 1L, false)))          // order 3 only
    // tightened children: everything reconciles, only childless fails
    val clean = DataAudit.reconcile(parents,
        Seq((1L, 10.0), (2L, 5.0)).toDF("ck", "amt"), "t",
        "pk", "ck", "total", col("amt"))
      .orderBy("chk").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getBoolean(4)))
    assert(clean.toSeq === Seq(
      ("amount_reconcile:total", 0L, true),
      ("childless:pk", 1L, false)))
  }

  test("rfmSegments: hand-computed recency/frequency/monetary and " +
       "interpolated quintile thresholds on a 3-customer feed") {
    import spark.implicits._
    def d(s: String) = java.sql.Timestamp.valueOf(s"2024-01-$s 00:00:00")
    val orders = Seq(
      (1L, d("10"), 100.0),
      (2L, d("01"), 50.0), (2L, d("05"), 50.0),
      (3L, d("01"), 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Events.rfmSegments(orders, "o_custkey", "o_orderdate",
        "o_totalprice")
      .orderBy("custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6)))
    // rec [0,5,9] -> thresholds 2.0/4.0/5.8/7.4; freq [1,1,2] ->
    // 1/1/1.2/1.6; mon(scaled) [1000,10000,10000] -> 4600/8200/10000/10000
    assert(got.toSeq === Seq(
      (1L, 0L, 1L, 100.0, 1, 1, 3),
      (2L, 5L, 2L, 100.0, 3, 5, 3),
      (3L, 9L, 1L, 10.0, 5, 1, 1)))
  }

  test("dpNoisyCounts: deterministic, noise scales linearly with " +
       "1/epsilon, released counts clamp at 0 and equal the recomputed " +
       "round(n + noise)") {
    import spark.implicits._
    val df = spark.range(50).select(($"id" % 40).cast("string").as("k"))
    def run(eps: Double) =
      DataAudit.dpNoisyCounts(df, eps, "k").orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3)))
    val a = run(1.0)
    assert(a.toSeq === run(1.0).toSeq, "hash-derived noise is replayable")
    // Laplace scale b = 1/eps is a linear factor of the inverse-CDF
    val tenth = run(0.1)
    for (((_, _, n1, _), (_, _, n10, _)) <- a.zip(tenth))
      assert(math.abs(n10 - 10.0 * n1) < 1e-4,
        s"eps 0.1 noise must be 10x the eps 1.0 noise: $n10 vs $n1")
    assert(a.exists(_._3 < 0.0) && a.exists(_._3 > 0.0),
      "both noise signs occur across 40 keys")
    for ((k, n, noise, released) <- tenth) {
      assert(released >= 0L, s"key $k released a negative count")
      val expect = math.max(0.0, math.round(n + noise).toDouble).toLong
      assert(released === expect, s"key $k: $released != $expect")
    }
  }

  test("cupedLift: a covariate that fully explains the metric drives " +
       "var_reduction to 1 and the adjusted diff to the true 0; a " +
       "constant covariate nulls theta but keeps the raw readout") {
    import spark.implicits._
    def t(day: String) = java.sql.Timestamp.valueOf(s"2024-01-$day 00:00:00")
    // y = 2x per user exactly; arms differ only through x imbalance
    val rows = (0 until 10).flatMap { u => Seq(
      (u.toLong, t("10"), "purchase", (u + 1).toDouble),
      (u.toLong, t("20"), "purchase", 2.0 * (u + 1)))
    }.toDF("user_id", "ts", "event_type", "value")
    val g = Events.cupedLift(rows, "user_id", "ts", "event_type",
      "purchase", "value", "2024-01-16", col("user_id") % 2)
      .collect().head
    // arm means: y 10 vs 12 (diff 2), x 5 vs 6; theta = 2 exactly
    assert(g.getLong(0) === 5L && g.getLong(1) === 5L)
    assert(g.getDouble(2) === 10.0 && g.getDouble(3) === 12.0)
    assert(g.getDouble(4) === 2.0 && g.getDouble(5) === 2.0)
    assert(g.getDouble(6) === 0.0, "theta*dx removes the whole raw diff")
    assert(g.getDouble(7) === 1.0, "perfect covariate: rho^2 = 1")
    // constant pre-period: var(X) = 0 -> adjusted quantities null
    val flat = (0 until 10).flatMap { u => Seq(
      (u.toLong, t("10"), "purchase", 7.0),
      (u.toLong, t("20"), "purchase", (u + 1).toDouble))
    }.toDF("user_id", "ts", "event_type", "value")
    val g2 = Events.cupedLift(flat, "user_id", "ts", "event_type",
      "purchase", "value", "2024-01-16", col("user_id") % 2)
      .collect().head
    assert(!g2.isNullAt(4) && g2.isNullAt(5) && g2.isNullAt(6) &&
      g2.isNullAt(7))
  }

  test("mdeReadout: hand-computed MDE from the arm variances, a " +
       "single-user arm nulls it, relative MDE scales by the pooled " +
       "mean") {
    import spark.implicits._
    def t = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    // arm0 users 0,2,4: revenue 1, 2, 3 units; arm1 users 1,3: 0
    val rows = Seq((0L, t, "purchase", 1.0), (2L, t, "purchase", 2.0),
      (4L, t, "purchase", 3.0), (1L, t, "view", 9.0),
      (3L, t, "view", 9.0))
      .toDF("user_id", "ts", "event_type", "value")
    val g = Events.mdeReadout(rows, "user_id", "event_type", "purchase",
      "value", col("user_id") % 2).collect().head
    assert(g.getLong(0) === 3L && g.getLong(1) === 2L)
    assert(g.getDouble(2) === 2.0 && g.getDouble(3) === 0.0)
    // var_a = 10000 cents^2, var_b = 0: mde = z*sqrt(10000/3)/100
    val mde = 2.801585 * math.sqrt(10000.0 / 3.0) / 100.0
    assert(math.abs(g.getDouble(4) - mde) < 1e-6)
    // pooled mean = 600 cents / 5 / 100 = 1.2
    assert(math.abs(g.getDouble(5) - mde / 1.2) < 1e-6)
    // an arm of one user has no variance estimate -> null MDE
    val one = rows.filter($"user_id" =!= 3L)
    val g2 = Events.mdeReadout(one, "user_id", "event_type", "purchase",
      "value", col("user_id") % 2).collect().head
    assert(g2.getLong(1) === 1L && g2.isNullAt(4) && g2.isNullAt(5))
  }

  test("srmCheck: a 10/30 split flags (chi2 = 10), a balanced split " +
       "scores 0 and passes") {
    import spark.implicits._
    def t = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val skew = (0 until 40).map(u =>
      (u.toLong, t, if (u < 10) 0 else 1))
      .toDF("user_id", "ts", "arm")
    val g = Events.srmCheck(skew, "user_id", col("arm")).collect().head
    assert(g.getLong(0) === 10L && g.getLong(1) === 30L)
    assert(g.getDouble(2) === 10.0 && g.getBoolean(3))
    val fair = (0 until 40).map(u => (u.toLong, t, u % 2))
      .toDF("user_id", "ts", "arm")
    val g2 = Events.srmCheck(fair, "user_id", col("arm")).collect().head
    assert(g2.getDouble(2) === 0.0 && !g2.getBoolean(3))
  }

  test("postStratifiedDiff: a pure mix artifact (zero within-stratum " +
       "effect, lopsided arms) adjusts to 0 while raw reads 1.0; " +
       "one-armed strata are excluded and their weight reported") {
    import spark.implicits._
    def t = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    // (user, arm, stratum, units): s0 = cheap stratum (y=1), s1 =
    // expensive (y=5), arms lopsided ACROSS strata but flat within;
    // s2 exists only in arm a
    val spec = Seq(
      (1L, 0, "s0", 1.0), (2L, 0, "s0", 1.0), (3L, 0, "s0", 1.0),
      (4L, 1, "s0", 1.0),
      (5L, 0, "s1", 5.0),
      (6L, 1, "s1", 5.0), (7L, 1, "s1", 5.0), (8L, 1, "s1", 5.0),
      (9L, 0, "s2", 7.0))
    val rows = spec.map { case (u, g, s, v) =>
      (u, t, "purchase", v, g, s)
    }.toDF("user_id", "ts", "event_type", "value", "g", "s")
    val got = Events.postStratifiedDiff(rows, "user_id", "event_type",
      "purchase", "value", col("g"), col("s")).collect().head
    assert(got.getLong(0) === 5L && got.getLong(1) === 4L)
    assert(got.getDouble(2) === 1.0, "raw diff is the mix artifact")
    assert(got.getDouble(3) === 0.0, "post-stratified removes it")
    assert(got.getLong(4) === 3L)
    assert(math.abs(got.getDouble(5) - 1.0 / 9.0) < 1e-6,
      "the one-armed stratum's weight is reported, not hidden")
  }

  test("gapEpisodes: missing-day runs count as episodes with their " +
       "lengths, coverage is over the key's own span, a single-day " +
       "key is fully covered") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
    val s = Seq(("k", day(1)), ("k", day(2)), ("k", day(5)),
      ("k", day(6)), ("k", day(10)), ("solo", day(3)))
      .toDF("g", "d")
    val got = DataAudit.gapEpisodes(s, "g", "d")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      // gaps: days 3-4 (run of 2) and 7-9 (run of 3)
      ("k", 5L, 10L, 2L, 5L, 3L, 0.5),
      ("solo", 1L, 1L, 0L, 0L, 0L, 1.0)))
  }

  test("exitRates: the session's LAST event is the exit, containment " +
       "counts a type once per session, never-exiting types report 0") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-10 00:$m%02d:00")
    // user 1: session 1 = a(0m), b(5m); 40-min gap; session 2 = b(45m),
    // c(50m). exits: b and c. containment: a 1, b 2, c 1.
    val rows = Seq((1L, t(0), 1L, "a"), (1L, t(5), 2L, "b"),
      (1L, t(45), 3L, "b"), (1L, t(50), 4L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.exitRates(rows, "user_id", "ts", "event_id",
        "event_type", gapMinutes = 30)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", 1L, 0L, 0.0), ("b", 2L, 1L, 0.5), ("c", 1L, 1L, 1.0)))
  }

  test("markovAccuracy: argmax model from the pre period only, ties to " +
       "the smallest successor, unseen from-states predict null and " +
       "score 0, same-timestamp order breaks by id") {
    import spark.implicits._
    def t(day: String, s: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day 00:00:$s%02d")
    var id = 0L
    def ev(u: Long, day: String, sec: Int, s: String) = {
      id += 1; (u, t(day, sec), id, s)
    }
    val pre =
      Seq("a", "b", "a", "b", "a", "c").zipWithIndex.map { case (s, i) =>
        ev(1L, "10", i, s) } ++                  // a->b x2, a->c, b->a x2
      Seq(ev(3L, "10", 0, "x"), ev(3L, "10", 1, "m"),
        ev(3L, "10", 2, "x"), ev(3L, "10", 3, "k")) // x->m, x->k tie -> k
    // user 4: both events share ONE timestamp; ids order s before t
    val tied = Seq((4L, t("10", 0), 900L, "s"), (4L, t("10", 0), 901L, "t"))
    val test = Seq("a", "b", "a", "c", "z", "a").zipWithIndex.map {
      case (s, i) => ev(2L, "20", i, s) } ++     // a->b ok, b->a ok,
      Seq(ev(5L, "20", 0, "s"), ev(5L, "20", 1, "t"), // a->c, c->z, z->a
        ev(6L, "20", 0, "x"), ev(6L, "20", 1, "k"))   // tie argmax -> k
    val df = (pre ++ tied ++ test)
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.markovAccuracy(df, "user_id", "ts", "event_id",
        "event_type", "2024-01-16")
      .orderBy("from_s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("a", 2L, 1L, "b", 0.5),   // model argmax b; test a->b, a->c
      ("b", 1L, 1L, "a", 1.0),
      ("c", 1L, 0L, null, 0.0),  // from c unseen in training
      ("s", 1L, 1L, "t", 1.0),   // tied-ts pre pair ordered by id
      ("x", 1L, 1L, "k", 1.0),   // count tie m/k -> smallest successor
      ("z", 1L, 0L, null, 0.0)))
  }
}
