package graft.analytics

import Par.Mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit rows — the dbt-tests/Deequ-style
  * contract checks a lake runs against every table, every load: row
  * counts, primary-key uniqueness, foreign-key orphans, null rates,
  * value ranges, accepted values. Every check is ONE aggregate over its
  * table (the uniqueness check's only shuffle is the key-distinct; the
  * FK check is a broadcast-or-shuffle anti join by size), and every
  * check emits the SAME one-row schema so audits union into one report:
  *
  *   (tbl, chk, metric, violations, pass)
  *
  * `metric` is the check's headline number (row count, duplicate rows,
  * orphan count, null fraction, out-of-range count), `violations` the
  * offending-row count, `pass` the verdict. Nulls never sneak through:
  * null FK keys are EXCLUDED from the orphan check (SQL's nullable-FK
  * convention), while the null-rate check counts them explicitly.
  */
object DataAudit {

  private def emit(df: DataFrame, tbl: String, check: String,
                   metric: org.apache.spark.sql.Column,
                   violations: org.apache.spark.sql.Column,
                   pass: org.apache.spark.sql.Column): DataFrame =
    df.agg(metric.as("m"), violations.as("v"), pass.as("p"))
      .select(lit(tbl).as("tbl"), lit(check).as("chk"),
        round(col("m").cast("double"), 6).as("metric"),
        col("v").cast("long").as("violations"), col("p").as("pass"))

  /** Row-count floor: metric = rows, violation-free iff rows >= minRows. */
  def rowCount(df: DataFrame, tbl: String, minRows: Long): DataFrame =
    emit(df, tbl, "row_count",
      count(lit(1)), lit(0L), count(lit(1)) >= minRows)

  /** Primary-key uniqueness: violations = rows beyond one per key. */
  def pkUnique(df: DataFrame, tbl: String, keyCol: String): DataFrame =
    emit(df, tbl, s"pk_unique:$keyCol",
      count(lit(1)) - countDistinct(col(keyCol)),
      count(lit(1)) - countDistinct(col(keyCol)),
      count(lit(1)) === countDistinct(col(keyCol)))

  /** Foreign-key orphans: child keys absent from the parent (null child
    * keys excluded — the nullable-FK convention). */
  def fkOrphans(child: DataFrame, parent: DataFrame, tbl: String,
                childKey: String, parentKey: String): DataFrame = {
    val orphans = child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
    emit(orphans, tbl, s"fk_orphans:$childKey",
      count(lit(1)), count(lit(1)), count(lit(1)) === 0)
  }

  /** Null-rate ceiling: metric = null fraction, pass iff <= maxRate.
    * An empty table has rate 0 and passes (no row violates) — the sums
    * coalesce so the verdict is a real boolean, never a NULL a
    * `getBoolean`/`pass = false` filter would choke on. */
  def nullRate(df: DataFrame, tbl: String, colName: String,
               maxRate: Double): DataFrame = {
    val nulls = coalesce(sum(when(col(colName).isNull, 1L).otherwise(0L)),
      lit(0L))
    val rate = coalesce(
      nulls.cast("double") / when(count(lit(1)) > 0, count(lit(1)))
        .cast("double"), lit(0.0))
    emit(df, tbl, s"null_rate:$colName", rate, nulls, rate <= maxRate)
  }

  /** Numeric range: violations = non-null values outside [lo, hi]
    * (empty table: zero violations, pass). */
  def valueRange(df: DataFrame, tbl: String, colName: String,
                 lo: Double, hi: Double): DataFrame = {
    val bad = coalesce(sum(when(col(colName).isNotNull &&
      (col(colName) < lo || col(colName) > hi), 1L).otherwise(0L)), lit(0L))
    emit(df, tbl, s"value_range:$colName", bad, bad, bad === 0)
  }

  /** Accepted values: violations = non-null values outside the set
    * (empty table: zero violations, pass). */
  def acceptedValues(df: DataFrame, tbl: String, colName: String,
                     allowed: Seq[String]): DataFrame = {
    require(allowed.nonEmpty, "allowed set must be non-empty")
    val bad = coalesce(sum(when(col(colName).isNotNull &&
      !col(colName).isin(allowed: _*), 1L).otherwise(0L)), lit(0L))
    emit(df, tbl, s"accepted_values:$colName", bad, bad, bad === 0)
  }

  /** Union audit rows into one report (same schema by construction). */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    checks.reduce(_ unionByName _)
  }

  /** Parent-child amount reconciliation — the warehouse invariant "a
    * header's total equals the sum of its lines" checked as audit
    * rows: `childless` (parents with NO child rows — metric/violations
    * = their count) and `amount_mismatch` (parents whose child sum
    * differs from the header amount by more than `tolerance` in
    * QUANTIZED units — both sides quantize once to `round(x * scale)`
    * so the comparison is integer-exact; childless parents are counted
    * once, in their own check, not double-flagged as mismatches).
    *
    * Scale shape: one child aggregation keyed on the join key + one
    * key-partitioned left join + one grouping-free rollup per check.
    * Output: two rows in the standard (tbl, chk, metric, violations,
    * pass) audit schema. */
  def reconcile(parent: DataFrame, child: DataFrame, tbl: String,
                parentKey: String, childKey: String,
                parentAmount: String, childAmount: org.apache.spark.sql.Column,
                tolerance: Double = 0.01,
                scale: Long = 100L): DataFrame = {
    val spark = parent.sparkSession
    import spark.implicits._
    val tolQ = math.round(tolerance * scale)
    val cs = child.filter(col(childKey).isNotNull)
      .select(col(childKey).as("__k"),
        round(childAmount * scale).cast("long").as("__ca"))
      .groupBy($"__k")
      .agg(sum($"__ca").cast("long").as("__child_sum"))
    val joined = parent.filter(col(parentKey).isNotNull)
      .select(col(parentKey).as("__k"),
        round(col(parentAmount) * scale).cast("long").as("__pa"))
      .join(cs, Seq("__k"), "left")
    val childless = emit(joined, tbl, s"childless:$parentKey",
      coalesce(sum(when($"__child_sum".isNull, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when($"__child_sum".isNull, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when($"__child_sum".isNull, 1L).otherwise(0L)),
        lit(0L)) === 0L)
    val mism = coalesce(sum(when($"__child_sum".isNotNull &&
      abs($"__pa" - $"__child_sum") > tolQ, 1L).otherwise(0L)), lit(0L))
    val mismatch = emit(joined, tbl, s"amount_reconcile:$parentAmount",
      mism, mism, mism === 0L)
    childless.unionByName(mismatch)
  }

  /** k-anonymity audit over a quasi-identifier combination — the
    * release gate before a dataset with indirect identifiers ships: a
    * row is RE-IDENTIFIABLE when its quasi-identifier equivalence class
    * holds fewer than `k` rows (Sweeney 2002), and the standard remedy
    * is suppressing or generalizing exactly those classes. Emits one
    * row per equivalence class with its size and the suppress verdict —
    * the input to the generalization loop, and the audit trail.
    *
    * Scale shape: ONE aggregation keyed on the quasi-identifier tuple
    * (map-side partials like any count); no row data moves beyond the
    * class keys, and the output is equivalence-class-sized. The
    * class-size distribution is exactly what [[graft.analytics
    * .Sketches.logHistQuantiles]] summarizes when classes outnumber
    * what a report can list.
    *
    * Output: (quasiCols..., class_size, suppress) ordered by caller. */
  def kAnonymity(df: DataFrame, k: Long, quasiCols: String*): DataFrame = {
    require(k >= 2 && quasiCols.nonEmpty,
      "need k >= 2 and at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("class_size"))
      .withColumn("suppress", col("class_size") < k)
  }

  /** Feed freshness / completeness audit per key — the ops dashboard a
    * lake runs per load: when did each slice last report
    * (staleness vs the FEED max, so a wholly-stalled feed reads zero
    * staleness everywhere — by design, this audits slices against each
    * other; wall-clock lag is the caller's clock injection), how many
    * distinct hours were active, and what fraction of the slice's own
    * first-seen→feed-max span that covers. Minute/hour arithmetic
    * counts BOUNDARY CROSSINGS (both sides truncate first), matching
    * SQL date_diff semantics rather than elapsed-time floors.
    *
    * One keyed aggregate + a broadcast one-row feed max. Output:
    * (key, last_seen, staleness_minutes, hours_active, hours_span,
    * completeness). */
  def freshness(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mx = df.agg(max(col(tsCol)).as("feed_max"))
    val per = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(max(col(tsCol)).as("last_seen"),
        min(col(tsCol)).as("first_seen"),
        count_distinct(date_trunc("hour", col(tsCol))).cast("long")
          .as("hours_active"))
    def minuteCrossings(a: Column, b: Column): Column =
      ((unix_micros(date_trunc("minute", b)) -
        unix_micros(date_trunc("minute", a))) / lit(60000000L))
        .cast("long")
    def hourCrossings(a: Column, b: Column): Column =
      ((unix_micros(date_trunc("hour", b)) -
        unix_micros(date_trunc("hour", a))) / lit(3600000000L))
        .cast("long")
    per.crossJoin(broadcast(mx))
      .select($"key", $"last_seen",
        minuteCrossings($"last_seen", $"feed_max").as("staleness_minutes"),
        $"hours_active",
        (hourCrossings($"first_seen", $"feed_max") + 1L).as("hours_span"),
        (round($"hours_active".cast("double") /
          when(hourCrossings($"first_seen", $"feed_max") + 1L > 0L,
            hourCrossings($"first_seen", $"feed_max") + 1L).cast("double")
          * 1e6) / 1e6).as("completeness"))
  }

  /** Benford first-digit audit — the fraud/synthetic-data screen: a
    * naturally-grown amount distribution follows
    * `P(d) = log10(1 + 1/d)`; fabricated or uniformly-generated
    * figures don't, and the per-digit deviation table is the evidence.
    * The first digit comes off the QUANTIZED integer (scaling by a
    * power of ten never changes a leading digit), non-positive amounts
    * are excluded (Benford is a positive-magnitude law), and all nine
    * digits emit even at zero observations so the table is always
    * 9-complete. One aggregate + a broadcast one-row total; the
    * result materializes (9 rows) so no broadcast reaches callers'
    * plans. Output: (digit, observed_n, observed_p, benford_p,
    * abs_dev). */
  def benford(df: DataFrame, amountCol: String,
              scale: Long = 100L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = spark.range(1, 10).select($"id".as("digit"))
    val counts = df
      .filter(col(amountCol).isNotNull && col(amountCol) > 0)
      .select(substring(round(col(amountCol) * scale).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy($"digit")
      .agg(count(lit(1)).cast("long").as("n"))
    val tot = counts.agg(sum($"n").cast("long").as("tot"))
    val bp = log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0))
    val op = coalesce($"n", lit(0L)).cast("double") /
      when($"tot" > 0L, $"tot").cast("double")
    digits.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select($"digit", coalesce($"n", lit(0L)).as("observed_n"),
        (round(op * 1e6) / 1e6).as("observed_p"),
        (round(bp * 1e6) / 1e6).as("benford_p"),
        (round(abs(op - bp) * 1e6) / 1e6).as("abs_dev"))
      .materialized()
  }

  /** Distinct l-diversity (Machanavajjhala 2007) — the k-anonymity
    * follow-through: a large equivalence class still leaks when every
    * member shares the SAME sensitive value (the homogeneity attack;
    * "all 40 patients in this quasi-class have the same diagnosis"),
    * so each class must also hold at least `l` distinct sensitive
    * values. Null sensitive values do not count toward diversity (a
    * null is an absent disclosure, not a distinct one).
    *
    * One aggregation keyed on the quasi tuple; the exact distinct
    * rides the same exchange as the count (Spark expands distinct
    * aggregates into a two-phase plan, still one logical pass).
    * Output: (quasiCols..., class_size, l_distinct, suppress) —
    * suppress when EITHER bound fails, since l-diversity subsumes
    * k-anonymity only when l >= k. */
  def lDiversity(df: DataFrame, k: Long, l: Long, sensitiveCol: String,
                 quasiCols: String*): DataFrame = {
    require(k >= 2 && l >= 2 && quasiCols.nonEmpty,
      "need k >= 2, l >= 2 and at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot also be a quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("class_size"),
        count_distinct(col(sensitiveCol)).cast("long").as("l_distinct"))
      .withColumn("suppress",
        col("class_size") < k || col("l_distinct") < l)
  }

  /** t-closeness (Li, Li & Venkatasubramanian 2007) — the third rung of
    * the anonymity ladder: a class can be large (k-anonymous) and
    * varied (l-diverse) yet still leak by SKEW — "90% of this class has
    * the sensitive flag vs 10% globally" updates an attacker's belief
    * massively. Each quasi-class's sensitive-value distribution must
    * stay within total-variation distance `t` of the GLOBAL
    * distribution (TVD is the categorical Earth-Mover's Distance the
    * paper uses for nominal attributes):
    * `tvd = sum over values of |p_class - p_global| / 2`.
    *
    * Null sensitive values are absent disclosures and are excluded
    * (the l-diversity rule). Scale shape: one (quasi, sensitive) agg
    * absorbs raw volume, the global distribution is a broadcast
    * dictionary, and the class x value completion is class-table x
    * value-dictionary — never row volume. Per-value terms round to 9
    * places and sum as scaled integers. Output:
    * (quasiCols..., class_size, tvd, suppress). */
  def tCloseness(df: DataFrame, t: Double, sensitiveCol: String,
                 quasiCols: String*): DataFrame = {
    require(t > 0.0 && t < 1.0 && quasiCols.nonEmpty,
      "need 0 < t < 1 and at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot also be a quasi-identifier")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(quasiCols.map(col) :+
        col(sensitiveCol).cast("string").as("__sens"): _*)
    val cells = base.groupBy(quasiCols.map(col) :+ $"__sens": _*)
      .agg(count(lit(1)).cast("long").as("c"))
    val classes = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum($"c").cast("long").as("class_size"))
    val global = base.groupBy($"__sens")
      .agg(count(lit(1)).cast("long").as("g"))
    val tot = global.agg(sum($"g").cast("long").as("tot"))
    val p = coalesce($"c", lit(0L)).cast("double") /
      $"class_size".cast("double")
    val q = $"g".cast("double") / $"tot".cast("double")
    val term = round(abs(p - q) * 1e9).cast("long")
    classes
      .crossJoin(broadcast(global.crossJoin(broadcast(tot))))
      .join(cells, quasiCols :+ "__sens", "left")
      .groupBy(quasiCols.map(col) :+ $"class_size": _*)
      .agg((round(sum(term) / 2.0 / 1e9 * 1e6) / 1e6).as("tvd"))
      .withColumn("suppress", $"tvd" > t)
  }

  /** Join-skew pre-flight audit of a key column: the per-key row-count
    * distribution — mean, p50/p99 (key-weighted), max, the share of all
    * rows held by the 10 heaviest keys, and max/mean — read BEFORE
    * shuffling 100 TB on that key. A shuffle partition receives its
    * keys' row counts; max/mean >> 1 or a fat top-10 share says one
    * task will straggle (or OOM) and the join wants [[graft.operators
    * .SaltedJoin]] / AQE skew handling, while a flat profile clears the
    * plain hash join. This is the audit-side complement to the q265
    * AMS sketch's self-join SIZE estimate.
    *
    * Shape: one key agg absorbs raw volume into the materialized key
    * dictionary (three consumers — totals, count-frequency sweep,
    * top-10 — read it; lazy, each re-scanned the feed); percentiles
    * compress to per-DISTINCT-count frequencies (the q215 rule — the
    * window runs over distinct multiplicity values, never keys) and
    * BOTH quantiles fold in one pass over that cumulative; the top-10
    * is a bounded TakeOrdered (map-side partial top-k, id tie-break),
    * never a global sort. Output: 1 row (n_rows, n_keys, mean_rows,
    * p50_rows, p99_rows, max_rows, top10_share, skew_ratio). */
  def joinSkewAudit(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import Par.Mat
    // the per-key count table feeds the totals, the count-frequency
    // sweep and the top-10 — materialize it so the feed is read once
    // (it is the compressed key dictionary, <= distinct keys)
    val keyCnt = Par.ensure(df).filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .materialized()
    val tot = keyCnt.agg(
      sum($"cnt").cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_keys"),
      max($"cnt").cast("long").as("max_rows"))
    val freq = keyCnt.groupBy($"cnt")
      .agg(count(lit(1)).cast("long").as("nk"))
    val win = org.apache.spark.sql.expressions.Window.orderBy($"cnt")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = freq.withColumn("cumk", sum($"nk").over(win))
      .crossJoin(broadcast(tot))
    // both quantiles in ONE pass over the cumulative (min(when(cond))
    // == the old filter+min, including the empty->null case): the two
    // separate pct() frames each re-ran freq's window sweep
    val pcts = cum.agg(
      min(when($"cumk" >=
          ceil(lit(0.5) * $"n_keys".cast("double")).cast("long"), $"cnt"))
        .cast("long").as("p50_rows"),
      min(when($"cumk" >=
          ceil(lit(0.99) * $"n_keys".cast("double")).cast("long"), $"cnt"))
        .cast("long").as("p99_rows"))
    val top10 = keyCnt.orderBy($"cnt".desc, $"k").limit(10)
      .agg(sum($"cnt").cast("long").as("top10_rows"))
    tot
      .crossJoin(broadcast(pcts))
      .crossJoin(broadcast(top10))
      .select($"n_rows", $"n_keys",
        (round($"n_rows".cast("double") /
          when($"n_keys" > 0L, $"n_keys").cast("double") * 1e6) / 1e6)
          .as("mean_rows"),
        $"p50_rows", $"p99_rows", $"max_rows",
        (round($"top10_rows".cast("double") /
          when($"n_rows" > 0L, $"n_rows").cast("double") * 1e6) / 1e6)
          .as("top10_share"),
        (round($"max_rows".cast("double") * $"n_keys" /
          when($"n_rows" > 0L, $"n_rows").cast("double") * 1e6) / 1e6)
          .as("skew_ratio"))
  }

  /** Gap-episode SLA audit per key: from a (key, day) activity series,
    * the number of MISSING-day runs, total missing days, the longest
    * single outage, and coverage over the key's own first..last span —
    * the gaps-and-islands readout a data-SLA review wants ("how often
    * did this feed go dark, and for how long at a stretch"), the
    * episode view [[freshness]]'s point-in-time staleness can't give.
    *
    * Shape: the series arrives pre-aggregated and deduplicates to
    * (key, day); ONE key-partitioned window lag computes each
    * observation's gap-before; everything else is a keyed aggregate.
    * Output: (key, n_days, span_days, n_gap_episodes, missing_days,
    * longest_gap, coverage). */
  def gapEpisodes(series: DataFrame, keyCol: String,
                  dayCol: String): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val s = series.select(col(keyCol).as("key"), col(dayCol).as("day"))
      .filter($"day".isNotNull).distinct()
    val w = Window.partitionBy($"key").orderBy($"day")
    val gapBefore = datediff($"day", lag($"day", 1).over(w)) - 1
    s.withColumn("gb", gapBefore)
      .groupBy($"key")
      .agg(count(lit(1)).cast("long").as("n_days"),
        (datediff(max($"day"), min($"day")) + 1).cast("long")
          .as("span_days"),
        sum(when($"gb" > 0, 1L).otherwise(0L)).cast("long")
          .as("n_gap_episodes"),
        sum(when($"gb" > 0, $"gb".cast("long")).otherwise(0L))
          .cast("long").as("missing_days"),
        coalesce(max(when($"gb" > 0, $"gb".cast("long"))), lit(0L))
          .as("longest_gap"))
      .withColumn("coverage",
        round(Par.safeDiv($"n_days".cast("double"),
          $"span_days".cast("double")) * 1e6) / 1e6)
  }

  /** Differentially-private count release: per-group counts plus
    * Laplace(1/epsilon) noise — the third leg of the privacy family
    * (k-anonymity and l-diversity suppress; DP perturbs, so every
    * group can be published). Counting queries have sensitivity 1, so
    * scale b = 1/epsilon gives epsilon-DP.
    *
    * The noise is DETERMINISTIC-by-hash (the project's bootstrap rule):
    * u = (h60(key) + 0.5) / 2^60 is uniform in (0,1) strictly — the
    * +0.5 keeps 1-2|u-0.5| away from ln(0) at BOTH hash extremes — and
    * inverse-CDF gives Laplace: -b * sign(u-.5) * ln(1-2|u-.5|). An
    * oracle replays it exactly; a production caller would swap the hash
    * input for a per-release salt. Post-processing clamps the released
    * count at 0 (post-processing never costs privacy budget).
    *
    * Shape: ONE keyed aggregate, then map-side scalar math on the
    * group rows. Output: (keys..., n, noise, noisy_n). */
  def dpNoisyCounts(df: DataFrame, epsilon: Double,
                    keyCols: String*): DataFrame = {
    require(epsilon > 0.0 && keyCols.nonEmpty,
      "need epsilon > 0 and at least one key column")
    val negB = -1.0 / epsilon
    val twoP60 = 1152921504606846976.0 // 2^60
    val counts = Par.ensure(df)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"))
    val u = (Sketches.h60(concat_ws("|",
      keyCols.map(c => col(c).cast("string")): _*))
      .cast("double") + 0.5) / lit(twoP60)
    val c = u - 0.5
    val noise = lit(negB) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    counts
      .withColumn("noise", round(noise * 1e6) / 1e6)
      // round() first so the double is integral — ANSI cast double→long
      // TRUNCATES in Spark but rounds in DuckDB; an integral value is
      // exact under both
      .withColumn("noisy_n",
        greatest(lit(0.0), round(col("n") + col("noise"))).cast("long"))
  }
}
