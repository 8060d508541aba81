package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches for corpus statistics: HyperLogLog and
  * k-minimum-values distinct-count estimates per group — the
  * capacity-planning numbers (distinct tokens/shingles per source or
  * shard) that exact `count(distinct)` can't deliver at 100 TB without a
  * full token-keyed shuffle. Both are deterministic BY CONSTRUCTION
  * (md5-derived hashes, integer register/sketch state, one final IEEE
  * division), so DuckDB oracles reproduce them bit-for-bit — unlike
  * Spark's own `approx_count_distinct`, whose HLL++ hash is engine-
  * private and un-oracle-able.
  *
  * Scale shapes: HLL state is 64 registers per group, KMV state is k
  * longs per group, and BOTH aggregate with map-side partials (HLL via
  * plain max/sum aggs, KMV via the bounded native
  * [[graft.functions.KmvSketch]] aggregate) — no per-group sort, no
  * unbounded collect, no funnel through one task for a hot group.
  */
object Sketches {

  /** First 15 md5 nibbles as a uniform 60-bit non-negative int64 — the
    * engine-portable hash (16 nibbles could overflow the signed cast). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val m = 64                    // registers (b = 6 index bits)
  private val twoP55 = 36028797018963968L // 2^55: the integer register scale
  // alpha_m * m^2 * 2^55, composed left-to-right exactly as the oracle SQL
  // writes it so both engines build the identical double constant
  private val hllNum = ((0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0) *
    36028797018963968.0

  /** Append the HLL columns for `value`: `bucket` (low 6 hash bits) and
    * `rho` (trailing-zero rank of the upper 54 bits, +1; 55 caps the
    * all-zero case — computed as `floor(log2(w & -w))`, exact in IEEE
    * because `w & -w` is a power of two). Shared by the batch estimator
    * and the STREAMING register aggregation
    * ([[graft.streaming.EventStreams]]) — one expression builder, so the
    * two paths cannot drift. */
  def withHllCols(df: DataFrame, value: Column): DataFrame =
    df.withColumn("h", h60(value))
      .withColumn("bucket", (col("h") % m).cast("int"))
      .withColumn("w", expr(s"h DIV $m"))
      .withColumn("rho", when(col("w") === 0, lit(55)).otherwise(
        (floor(log2(col("w").bitwiseAND(-col("w")))) + 1).cast("int")))
      .drop("h", "w")

  /** Fold a register table `(keyCols..., r)` — one row per non-empty
    * register — into `(keyCols..., n_registers, est_distinct)`. Register
    * sums use INTEGER `2^(55-r)` terms so no addition-order rounding can
    * diverge between engines; the only floating math is the final
    * division and (in the sparse regime) the standard linear-counting
    * correction `m * ln(m / V)` when the raw estimate is under 2.5m and
    * empty registers remain. Mergeable by construction: registers from
    * any partial run (a stream's state store, per-shard sketches) max
    * together before this fold. */
  def estimateFromRegisters(regs: DataFrame,
                            keyCols: Seq[String]): DataFrame = {
    import regs.sparkSession.implicits._
    regs.groupBy(keyCols.map(col): _*)
      .agg(sum(expr("shiftleft(cast(1 as bigint), 55 - r)")).as("s"),
        count(lit(1)).as("nb"))
      .withColumn("total",
        $"s" + (lit(m.toLong) - $"nb") * lit(twoP55))
      .select(keyCols.map(col) :+
        $"nb".cast("long").as("n_registers") :+
        round({
          val raw = lit(hllNum) / $"total".cast("double")
          val v = lit(m.toLong) - $"nb" // empty registers
          when(raw <= lit(2.5 * m) && v > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
            .otherwise(raw)
        }, 6).as("est_distinct"): _*)
  }

  /** HyperLogLog distinct estimate of `value` per `keyCol` (m = 64
    * registers): [[withHllCols]] -> per-(key, bucket) max ->
    * [[estimateFromRegisters]].
    *
    * Output: (key, n_registers, est_distinct). */
  def hllDistinct(df: DataFrame, keyCol: String, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val regs = withHllCols(
        Par.ensure(df).select(col(keyCol).as("key"), value.as("v0")),
        $"v0")
      .groupBy($"key", $"bucket").agg(max($"rho").as("r"))
    estimateFromRegisters(regs, Seq("key"))
      .withColumnRenamed("key", keyCol)
  }

  /** Count-Min sketch counters of `value` per `keyCol`: `depth` rows of
    * `width` integer counters, bucket `d` = md5("d|value") — the bounded
    * frequency table (depth x width longs per group) where an exact
    * per-token count table is vocabulary-sized. Counters are plain sums:
    * map-side partials, mergeable across shards/streams by addition.
    * Output: (key, d, bucket, c). */
  def cmCounters(df: DataFrame, keyCol: String, value: Column,
                 depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    Par.ensure(df)
      .select(col(keyCol).as("key"), value.as("v0"))
      .select($"key", $"v0",
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select($"key", $"d",
        (conv(substring(md5(concat($"d".cast("string"), lit("|"), $"v0")),
          1, 8), 16, 10).cast("long") % width).cast("int").as("bucket"))
      .groupBy($"key", $"d", $"bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates from [[cmCounters]] for literal `probes`:
    * `est = min over d of counter[d][bucket_d(probe)]` (missing counter
    * rows read 0). The probe grid is (distinct keys x probes x depth) —
    * dictionary-sized — and the counter side is depth x width per key,
    * so the whole probe is broadcast-scale regardless of corpus size.
    * Output: (key, word, est). */
  def cmEstimate(counters: DataFrame, probes: Seq[String],
                 depth: Int = 4, width: Int = 64): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    val spark = counters.sparkSession
    import spark.implicits._
    val probeRows = probes.flatMap { p =>
      (0 until depth).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$d|$p".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
          ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
        (p, d, (h % width).toInt)
      }
    }
    val pdf = probeRows.toDF("word", "d", "bucket")
    counters.select($"key").distinct()
      .crossJoin(broadcast(pdf))
      .join(counters, Seq("key", "d", "bucket"), "left")
      .groupBy($"key", $"word")
      .agg(min(coalesce($"c", lit(0L))).as("est"))
  }

  /** Bloom-filter bit registers of `value` per `keyCol`: `mBits` bits
    * packed into `mBits/64` longs, `kHashes` bit positions per value from
    * md5("value|j") — the bounded membership table for at-scale
    * decontamination and blocklist probes, where the exact value set is
    * corpus-sized but the filter is a few KB per group. Registers build
    * with a plain `bit_or` aggregate: map-side partials, and filters from
    * any partial run (per-shard builds, a stream's state) merge by OR.
    * No false negatives ever; false-positive rate is the standard
    * (1 - e^(-kn/m))^k, deterministic by construction (md5 positions,
    * integer bit state — no engine-private hashing).
    * Output: (key, idx, bits) — one row per non-empty 64-bit word. */
  def bloomRegisters(df: DataFrame, keyCol: String, value: Column,
                     mBits: Int = 1024, kHashes: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0,
      "mBits must be a positive multiple of 64")
    require(kHashes >= 1, "kHashes must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    Par.ensure(df)
      .select(col(keyCol).as("key"), value.cast("string").as("v0"))
      .select($"key", explode(array((0 until kHashes).map(j =>
        h60(concat($"v0", lit("|" + j))) % mBits): _*)).as("p"))
      .groupBy($"key", expr("cast(p DIV 64 as int)").as("idx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))")
        .as("bits"))
  }

  /** Membership probes of literal `probes` against [[bloomRegisters]]
    * output: member iff ALL `kHashes` bit positions are set. Probe
    * positions are computed driver-side (same md5 construction), the grid
    * is (distinct keys x probes x kHashes) — dictionary-sized — so the
    * probe never rescans a corpus; `n_set_bits` (filter fill, the input
    * to the fp-rate formula) rides the same pass.
    * Output: (key, word, member, n_set_bits). */
  def bloomContains(regs: DataFrame, probes: Seq[String],
                    mBits: Int = 1024, kHashes: Int = 3): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    val spark = regs.sparkSession
    import spark.implicits._
    val probeRows = probes.flatMap { p =>
      (0 until kHashes).map { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = md.take(8).map(b => f"$b%02x").mkString.take(15)
        val pos = (java.lang.Long.parseLong(hex, 16) % mBits).toInt
        (p, j, pos / 64, 1L << (pos % 64))
      }
    }
    val pdf = probeRows.toDF("word", "j", "idx", "pbit")
    val fill = regs.groupBy($"key")
      .agg(sum(bit_count($"bits")).cast("long").as("n_set_bits"))
    regs.select($"key").distinct()
      .crossJoin(broadcast(pdf))
      .join(regs, Seq("key", "idx"), "left")
      .groupBy($"key", $"word")
      .agg(min(coalesce($"bits", lit(0L)).bitwiseAND($"pbit") =!= 0)
        .as("member"))
      .join(fill, Seq("key"))
  }

  /** k-minimum-values distinct estimate of `value` per `keyCol`: keep the
    * k smallest distinct 60-bit hashes (the bounded native
    * [[graft.functions.KmvSketch]] aggregate), then
    * `est = (k-1) / (h_k / 2^60)`; a group with fewer than k distinct
    * values returns its EXACT count (the sketch holds the whole set).
    *
    * Output: (key, n_sketch, est_distinct). */
  def kmvDistinct(df: DataFrame, keyCol: String, value: Column,
                  k: Int = 16): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    Par.ensure(df)
      .select(col(keyCol).as("key"), h60(value).as("h"))
      .groupBy($"key")
      .agg(graft.functions.KmvSketch.kmvMinHashes($"h", k).as("mins"))
      .select($"key".as(keyCol),
        size($"mins").cast("long").as("n_sketch"),
        round(when(size($"mins") < k, size($"mins").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at($"mins", k).cast("double") /
              lit(1152921504606846976.0))), 6).as("est_distinct"))
  }

  /** Pairwise distinct-value overlap estimates between groups via KMV
    * sketch SET OPERATIONS — the audience/corpus-overlap matrix from
    * sketches alone: a KMV sketch of the UNION of two sets is the k
    * smallest of the merged sketches (theta-sketch union rule), so
    * `|A∪B|` estimates from the merged k-th order statistic,
    * `|A∩B| = |A|+|B|-|A∪B|` by inclusion-exclusion, and Jaccard
    * follows — all WITHOUT rescanning either set. The exact q115-style
    * matrix must shuffle every (group, value) pair; this reads the
    * corpus once for dictionary-sized sketch rows, and per-group
    * sketches persisted from earlier runs merge the same way (the
    * cross-snapshot overlap monitor).
    *
    * The pair probe is a deliberate broadcast cross of the
    * dictionary-sized sketch table against itself (keys x keys rows,
    * each carrying two k-long arrays); all merge work is bounded array
    * ops (concat/distinct/sort/slice at 2k elements). Groups with fewer
    * than k distinct values carry their EXACT set, so their estimates
    * (and unions under k) are exact. Deterministic by construction:
    * md5-derived hashes, integer sketch state, IEEE tails.
    *
    * Output: (key_a, key_b, est_a, est_b, est_union, est_inter,
    * est_jaccard) for every unordered pair, estimates rounded to 6. */
  /** Lincoln-Petersen capture-recapture estimate of a population's
    * size from two overlapping observation windows: keys marked by
    * `sampleA` and `sampleB` predicates, estimate = n1*n2/overlap —
    * the ecology estimator that doubles as a coverage audit for ANY
    * partial observation process (two crawls, two log shards, two
    * days of traffic: how many users exist beyond what either window
    * saw?). Reported against the actual distinct count with relative
    * error, so the estimator itself is auditable where ground truth
    * exists. Zero overlap nulls the estimate (undefined, not
    * infinity).
    *
    * Shape: one key-keyed agg collapses observations to per-key
    * membership flags, then ONE 1-row rollup. Output: 1 row
    * (n1, n2, overlap, lp_estimate, n_actual, rel_err). */
  def captureRecapture(df: DataFrame, keyCol: String, sampleA: Column,
                       sampleB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = Par.ensure(df)
      .select(col(keyCol).as("k"),
        when(sampleA, 1L).otherwise(0L).as("a"),
        when(sampleB, 1L).otherwise(0L).as("b"))
      .filter($"k".isNotNull)
      .groupBy($"k").agg(max($"a").as("ina"), max($"b").as("inb"))
    val agg = k.agg(
      count(lit(1)).cast("long").as("n_actual"),
      sum($"ina").cast("long").as("n1"),
      sum($"inb").cast("long").as("n2"),
      sum($"ina" * $"inb").cast("long").as("overlap"))
    val lp = $"n1".cast("double") * $"n2" /
      when($"overlap" > 0L, $"overlap").cast("double")
    agg.select($"n1", $"n2", $"overlap",
      (round(lp * 1e6) / 1e6).as("lp_estimate"),
      $"n_actual",
      (round((lp - $"n_actual") /
        when($"n_actual" > 0L, $"n_actual").cast("double") * 1e6) / 1e6)
        .as("rel_err"))
  }

  def kmvOverlap(df: DataFrame, keyCol: String, value: Column,
                 k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val sk = Par.ensure(df)
      .select(col(keyCol).as("key"), h60(value).as("h"))
      .groupBy($"key")
      .agg(graft.functions.KmvSketch.kmvMinHashes($"h", k).as("mins"))
    def est(mins: Column): Column =
      when(size(mins) < k, size(mins).cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (element_at(mins, k).cast("double") / lit(1152921504606846976.0)))
    val a = sk.select($"key".as("key_a"), $"mins".as("mins_a"))
    val b = sk.select($"key".as("key_b"), $"mins".as("mins_b"))
    val inter = greatest(lit(0.0),
      est($"mins_a") + est($"mins_b") - est($"mu"))
    a.join(broadcast(b), $"key_a" < $"key_b")
      .withColumn("mu", slice(array_sort(array_distinct(
        concat($"mins_a", $"mins_b"))), 1, k))
      .select($"key_a", $"key_b",
        round(est($"mins_a"), 6).as("est_a"),
        round(est($"mins_b"), 6).as("est_b"),
        round(est($"mu"), 6).as("est_union"),
        round(inter, 6).as("est_inter"),
        // a group whose value expression is entirely null carries an
        // EMPTY sketch: est_union 0.0 would make this 0/0 = NaN —
        // safeDiv nulls the degenerate pair instead (project rule)
        round(Par.safeDiv(inter, est($"mu")), 6).as("est_jaccard"))
  }

  /** Approximate per-group quantiles from the bounded
    * [[graft.functions.LogHist]] base-2 log-linear histogram — the
    * mergeable percentile sketch (HdrHistogram/DDSketch family) for
    * latency/length monitoring where exact `percentile()` would hold
    * every distinct value per group. One aggregation pass builds a
    * `(64-s)*2^s`-bucket integer histogram per key (map-side partials,
    * merges by addition — streaming-state-safe); the estimate for
    * quantile q is the LOWER BOUND of the bucket where the cumulative
    * count first reaches `ceil(q*n)`, guaranteeing
    * `est <= true_quantile < est * (1 + 2^(1-s))` — relative value error
    * under `2^-s` (6.25% at s=4), values below `2^s` exact.
    *
    * Deterministic by construction: bucket boundaries are pure integer
    * shifts (never `log()`), so a SQL oracle reproduces every index from
    * `length(bin(x))`. The post-histogram walk is dictionary-sized —
    * at most `(64-s)*2^s` rows per key — so the window sort after the
    * sketch agg touches keys x 960 rows regardless of input volume.
    *
    * Output: (key, n, p<q1>, p<q2>, ...) — estimates as BIGINT. */
  def logHistQuantiles(df: DataFrame, keyCol: String, value: Column,
                       subBits: Int = 4,
                       qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val s = subBits
    val twoS = 1 << s
    val hist = Par.ensure(df)
      .select(col(keyCol).as("key"), value.cast("long").as("v0"))
      .groupBy($"key")
      .agg(graft.functions.LogHist.histCounts($"v0", s).as("counts"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"key")
    val bkts = hist
      .select($"key", posexplode($"counts").as(Seq("idx", "c")))
      .filter($"c" > 0)
      .withColumn("cum", sum($"c").over(wCum))
      .withColumn("n", sum($"c").over(wAll))
      // inverse of the bucket map: small buckets are their own bound,
      // otherwise ((idx % 2^s) + 2^s) << (idx/2^s - 1)
      .withColumn("lo", when($"idx" < twoS, $"idx".cast("long"))
        .otherwise(expr(s"shiftleft(cast(idx % $twoS + $twoS as bigint), " +
          s"cast(idx DIV $twoS as int) - 1)")))
    val qCols = qs.map { q =>
      val nm = "p" + BigDecimal(q * 100).bigDecimal.stripTrailingZeros
        .toPlainString.replace(".", "_")
      min(when($"cum" >= ceil(lit(q) * $"n".cast("double")), $"lo")).as(nm)
    }
    bkts.groupBy($"key")
      .agg(max($"n").cast("long").as("n"), qCols: _*)
      .withColumnRenamed("key", keyCol)
  }

  /** TRAILING-WINDOW distinct estimate per (key, hour) by MERGING
    * hourly HLL registers — "distinct users in the last 24h, every
    * hour": the query `count(distinct)` cannot serve at scale without
    * re-scanning 24h of events per hour, and cannot serve on a stream
    * at all. Hourly registers (the q118 fold) merge across the trailing
    * window by per-bucket MAX — the HLL union rule, associative and
    * idempotent — so each hour's estimate reads 64 integers per covered
    * hour, never events. The bucket grid densifies per active (key, hr)
    * so a bucket seen only EARLIER in the window still merges (a naive
    * window over existing register rows silently drops those).
    *
    * Scale shape: one corpus pass builds (key, hr, bucket) rows; the
    * merge window runs over keys x hours x 64 rows — calendar-sized.
    * The same registers a streaming state store holds merge identically
    * (max), so a live implementation shares this exact math.
    *
    * Output: (key, hr, n_registers, est_distinct) per ACTIVE hour. */
  def hllSlidingDistinct(df: DataFrame, keyCol: String, tsCol: String,
                         value: Column, trailing: Int = 24): DataFrame = {
    require(trailing >= 1, "trailing must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import Par.Mat
    // the register table feeds the hour grid AND the merge join —
    // materialize the (key, hr, bucket) grid (<= keys x hours x 64
    // small-int rows) so raw volume is hashed exactly once
    val regs = withHllCols(
        Par.ensure(df).select(col(keyCol).as("key"),
          floor(unix_timestamp(col(tsCol)) / 3600L).cast("long").as("hr"),
          value.as("v0")), $"v0")
      .groupBy($"key", $"hr", $"bucket").agg(max($"rho").as("r"))
      .materialized()
    val grid = regs.select($"key", $"hr").distinct()
      .select($"key", $"hr",
        explode(sequence(lit(0), lit(m - 1))).as("bucket"))
    val w = Window.partitionBy($"key", $"bucket").orderBy($"hr")
      .rangeBetween(-(trailing - 1).toLong, 0L)
    val merged = grid.join(regs, Seq("key", "hr", "bucket"), "left")
      .withColumn("rm", max($"r").over(w))
      .filter($"rm".isNotNull)
      .select($"key", $"hr", $"bucket", $"rm".as("r"))
    estimateFromRegisters(merged, Seq("key", "hr"))
      .withColumnRenamed("key", keyCol)
  }

  /** Per-row CDF (percentile-rank) normalization against each group's
    * OWN distribution, from the bounded [[graft.functions.LogHist]]
    * sketch — the cross-source score-fusion step: a raw score is
    * comparable across sources only as "what fraction of its source
    * scores at or below it", and the exact form (`cume_dist` windowed
    * per source) funnels every source through one task's sort. Here the
    * per-group histogram aggregates once (960 integer counters,
    * map-side partials), BROADCASTS, and the normalization is a pure
    * map-side projection: `cdf(x) = (count in buckets <= bucket(x)) / n`
    * — the step-CDF at sketch resolution (exact bucket boundaries, no
    * interpolation, deterministic; monotone in x by construction).
    *
    * Output: (id, group, value, cdf) — cdf in (0, 1], rounded 6; rows
    * with value < 1 get null cdf (outside the sketch domain). */
  def logHistCdf(df: DataFrame, idCol: String, valueCol: String,
                 groupCol: String, subBits: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = subBits
    val twoS = 1 << s
    // model columns stay __ch_-prefixed through the join so a caller
    // whose input already has counts/n columns cannot collide
    val hist = Par.ensure(df)
      .select(col(groupCol).as("__ch_grp"), col(valueCol).cast("long").as("v0"))
      .groupBy($"__ch_grp")
      .agg(graft.functions.LogHist.histCounts($"v0", s).as("__ch_counts"),
        sum(when(col("v0") >= 1, 1L).otherwise(0L)).as("__ch_n"))
    // bucket(x) inline (same integer formula as the aggregate), then the
    // prefix sum over the broadcast counts array — a <=960-element fold
    val idx = when(col(valueCol).cast("long") < twoS,
        col(valueCol).cast("long"))
      .otherwise(expr(
        s"(cast(length(bin(cast($valueCol as bigint))) - 1 - $s + 1 as bigint) * $twoS) + " +
        s"shiftright(cast($valueCol as bigint), " +
        s"cast(length(bin(cast($valueCol as bigint))) - 1 - $s as int)) - $twoS"))
    df.join(broadcast(hist), col(groupCol) === $"__ch_grp")
      .select(col(idCol).as("id"), col(groupCol), col(valueCol),
        when(col(valueCol).cast("long") >= 1, round(Par.safeDiv(
          aggregate(slice($"__ch_counts", lit(1), (idx + 1).cast("int")),
            lit(0L), (acc, x) => acc + x).cast("double"),
          $"__ch_n".cast("double")), 6)).as("cdf"))
  }

  /** EXACT corpus heavy hitters — every distinct `value` whose frequency
    * is strictly above N/k — via the classic two-pass sketch plan:
    *
    *  1. one scan aggregates the bounded [[graft.functions.MisraGries]]
    *     summary (≤ k string counters per partial, merged map-side like
    *     any agg) alongside `count(*)`; the merged summary's keys are a
    *     GUARANTEED superset of every item with frequency > N/k, and only
    *     that ≤ k-element candidate array ever reaches the driver;
    *  2. a second scan recounts ONLY the candidates (a ≤ k-literal `In`
    *     filter evaluated map-side, then a partial-aggregable count over
    *     ≤ k surviving keys) and keeps those with `cnt * k > N`.
    *
    * The result is exactly the SQL `HAVING count(*) * k > N` answer, but
    * no vocabulary-sized aggregation state or shuffle ever forms: at
    * 10^9 distinct tokens the exact GROUP BY must move every distinct
    * key, while this plan moves k strings per partition in pass 1 and
    * ≤ k keys total in pass 2.
    *
    * Output: (item, cnt, frac) — frac = cnt/N rounded to 6 places. */
  def heavyHitters(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // N counts NON-NULL values only — the sketch and the recount both
    // ignore nulls, so count(*) would inflate the threshold on a
    // null-bearing column and break the exact HAVING parity
    val firstPass = Par.ensure(df)
      .agg(count(value).cast("long").as("n"),
        graft.functions.MisraGries.mgCandidates(value, k).as("cand"))
      .collect()(0)
    val n = firstPass.getLong(0)
    val cands = firstPass.getSeq[String](1)
    Par.ensure(df)
      .select(value.as("item"))
      .filter($"item".isin(cands: _*))
      .groupBy($"item")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .filter($"cnt" * k > n)
      .withColumn("frac", round($"cnt".cast("double") / lit(n.toDouble), 6))
  }

  /** AMS (Alon-Matias-Szegedy) F2 sketch: estimate the second frequency
    * moment `F2 = sum over keys of count^2` — which IS the self-join
    * size on that key, the number a join planner needs BEFORE running
    * the join (equi-join output = sum over keys of cnt_a * cnt_b <=
    * sqrt(F2_a * F2_b)) — from ONE map-side pass holding 16 integers.
    * Estimator j keeps `Z_j = sum over rows of sign_j(key)` with
    * `sign_j` the j-th md5-nibble high bit (the q20 SimHash sign
    * convention, deterministic and engine-portable); `E[Z_j^2] = F2`
    * exactly (pairwise sign independence), so the report carries the
    * mean of 16 AND the classic median-of-means (4 groups of 4 — the
    * outlier-robust form), each against the exact F2 with signed
    * relative error — the estimator audits itself where truth is
    * computable.
    *
    * Scale shape: the sketch is one aggregate of 16 integer sums with
    * map-side partials (nothing keyed ever shuffles — this is the
    * 100 TB path); the exact side is one key-keyed count-agg, and the
    * two 1-row frames cross as broadcasts. |Z_j| <= n < 2^53 keeps
    * Z^2 exact in IEEE. Output: 1 row (n_rows, n_keys, exact_f2,
    * est_mean, est_median_means, rel_err_mean, rel_err_mom). */
  def amsF2(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val w = Par.ensure(df).filter(col(keyCol).isNotNull)
      .select(md5(col(keyCol).cast("string")).as("h"))
    val zs = (1 to 16).map(j =>
      sum(when(substring($"h", j, 1).isin(hi: _*), 1L).otherwise(-1L))
        .cast("long").as(s"z$j"))
    val sk = w.agg(count(lit(1)).cast("long").as("n_rows"), zs: _*)
    val sq = (1 to 16).map(j =>
      (col(s"z$j").cast("double") * col(s"z$j")).as(s"s$j"))
    val means = (0 until 4).map(g =>
      ((col(s"s${4 * g + 1}") + col(s"s${4 * g + 2}") +
        col(s"s${4 * g + 3}") + col(s"s${4 * g + 4}")) / 4.0)
        .as(s"m$g"))
    val est = sk.select(($"n_rows" +: sq): _*)
      .select(($"n_rows" +:
        ((1 to 16).map(j => col(s"s$j")) ++ means)): _*)
      .select($"n_rows",
        (((1 to 16).map(j => col(s"s$j")).reduce(_ + _)) / 16.0)
          .as("est_mean"),
        sort_array(array($"m0", $"m1", $"m2", $"m3")).as("ms"))
      .select($"n_rows", round($"est_mean", 6).as("est_mean"),
        round((element_at($"ms", 2) + element_at($"ms", 3)) / 2.0, 6)
          .as("est_median_means"))
    val exact = Par.ensure(df).filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum($"cnt".cast(DecimalType(38, 0)) * $"cnt")
          .cast("long").as("exact_f2"))
    est.crossJoin(broadcast(exact))
      .select($"n_rows", $"n_keys", $"exact_f2", $"est_mean",
        $"est_median_means",
        round(($"est_mean" - $"exact_f2".cast("double")) /
          when($"exact_f2" > 0L, $"exact_f2".cast("double")) * 1e6)
          .divide(1e6).as("rel_err_mean"),
        round(($"est_median_means" - $"exact_f2".cast("double")) /
          when($"exact_f2" > 0L, $"exact_f2".cast("double")) * 1e6)
          .divide(1e6).as("rel_err_mom"))
  }
}
