package graft.analytics

import Par.Mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event feed: ordered-step funnel
  * conversion and cohort retention — the two rollups every event
  * warehouse serves daily, expressed so no per-user event list is ever
  * collected: each is user-keyed aggregation + dictionary-sized joins,
  * the shape that holds at 10^9 users x 10^12 events.
  */
object Events {

  /** Ordered funnel conversion over `steps` event types: a user reaches
    * step i+1 only with an event of that type STRICTLY AFTER their
    * earliest completion of step i (the classic ordered-funnel
    * semantics — unordered "did all three" overcounts users who
    * purchased before ever viewing). Completion time of step i+1 is the
    * user's EARLIEST qualifying event, computed left-to-right.
    *
    * Scale shape: one user-keyed min-aggregation per step over only
    * that step's type slice (map-side type filter, then partial aggs),
    * joined user-keyed to the previous step's table — never a window
    * over a user's full event history, never an event-list collect. The
    * final rollup is one steps-sized table.
    *
    * Output: (step, step_name, n_users, rate_vs_prev, rate_vs_first) —
    * one row per step, rates rounded to 6 (step 1 rates = 1.0). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    // reached(i): (u, t_i) — earliest completion of step i per user.
    // Each step is Par.materialize'd: step i's table feeds BOTH step
    // i+1's join and its own count branch, and Spark shares no
    // non-identical subplans — uncheckpointed, an s-step funnel would
    // rescan the feed O(s^2) times instead of once per step
    val step1 = ev.filter($"t" === steps.head)
      .groupBy($"u").agg(min($"ts").as("t_step"))
      .materialized()
    val reached = steps.tail.scanLeft(step1) { (prev, stepType) =>
      ev.filter($"t" === stepType)
        .join(prev.select($"u", $"t_step".as("t_prev")), Seq("u"))
        .filter($"ts" > $"t_prev")
        .groupBy($"u").agg(min($"ts").as("t_step"))
        .materialized()
    }
    val counts = reached.zipWithIndex.map { case (r, i) =>
      r.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          $"n_users")
    }.reduce(_ unionByName _)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"step") // steps-sized table: a 1-task window is fine
    counts
      .withColumn("rate_vs_prev",
        round(Par.safeDiv($"n_users".cast("double"),
          coalesce(lag($"n_users", 1).over(w), $"n_users").cast("double")),
          6))
      .withColumn("rate_vs_first",
        round(Par.safeDiv($"n_users".cast("double"),
          first($"n_users").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")),
          6))
  }

  /** Two-sample A/B conversion test: users split by `cohortCol`
    * (0 = control, 1 = treatment; must be constant per user — e.g. a
    * deterministic hash bucket), conversion = the user emitted
    * `convType` at least once. Reports per-cohort rates, relative
    * lift, and the pooled two-proportion z statistic
    * `z = (pB - pA) / sqrt(p(1-p)(1/nA + 1/nB))` — the experiment
    * readout; |z| > 1.96 is the usual 95% call.
    *
    * Scale shape: one user-keyed agg collapses the feed to one row per
    * user (conversion is max of a flag — order-free), then ONE 1-row
    * conditional aggregate computes every cell; nothing after the
    * per-user agg exceeds a scalar row.
    *
    * Output: 1 row (n_a, n_b, conv_a, conv_b, p_a, p_b, lift, z),
    * floats rounded 6; lift/z null when a denominator is 0. */
  def abLift(events: DataFrame, userCol: String, typeCol: String,
             convType: String, cohortCol: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val u = events
      .select(col(userCol).as("u"), cohortCol.cast("int").as("g"),
        when(col(typeCol) === convType, 1L).otherwise(0L).as("c"))
      .groupBy($"u").agg(max($"g").as("g"), max($"c").as("c"))
    val agg = u.agg(
      sum(when($"g" === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when($"g" === 1, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when($"g" === 0, $"c").otherwise(0L)).cast("long").as("conv_a"),
      sum(when($"g" === 1, $"c").otherwise(0L)).cast("long").as("conv_b"))
    // every ratio through Par.safeDiv (null-on-zero denominator): an
    // empty cohort, a zero conversion rate, or a degenerate pooled p
    // must yield null, never an ANSI DIVIDE_BY_ZERO
    import Par.safeDiv
    val pa = safeDiv($"conv_a".cast("double"), $"n_a".cast("double"))
    val pb = safeDiv($"conv_b".cast("double"), $"n_b".cast("double"))
    val pp = safeDiv(($"conv_a" + $"conv_b").cast("double"),
      ($"n_a" + $"n_b").cast("double"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (safeDiv(lit(1.0), $"n_a".cast("double")) +
        safeDiv(lit(1.0), $"n_b".cast("double"))))
    agg.select($"n_a", $"n_b", $"conv_a", $"conv_b",
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      when($"n_a" > 0 && $"n_b" > 0 && $"conv_a" > 0,
        round(safeDiv(pb, pa) - 1.0, 6)).as("lift"),
      when($"n_a" > 0 && $"n_b" > 0 && se > 0,
        round(safeDiv(pb - pa, se), 6)).as("z"))
  }

  /** CUPED-adjusted A/B readout on a continuous metric: each user's
    * post-period metric Y (sum of `valueCol` on `convType` rows at or
    * after `splitDay`) is adjusted by their PRE-period covariate X
    * (same sum before `splitDay`) via the pooled
    * theta = cov(X,Y)/var(X):  Y' = Y - theta (X - mean X). The
    * adjusted arm difference equals the raw one in expectation but
    * with variance shrunk by rho^2 = corr(X,Y)^2 — the standard trick
    * that makes a continuous-metric experiment readable weeks sooner.
    * The user universe is EVERYONE in the feed (a user with no
    * qualifying rows contributes 0, not a dropped row).
    *
    * Scale shape: one user-keyed aggregate collapses the feed, then
    * ONE 1-row aggregate computes every power sum; values quantize to
    * integer cents first, so both engines derive theta and the
    * adjusted difference from identical integers (per-user cent sums
    * stay far under 2^31, so the long x*x products cannot overflow —
    * the q231 magnitude rule).
    *
    * Output: 1 row (n_a, n_b, mean_y_a, mean_y_b, diff_raw, theta,
    * diff_adj, var_reduction); theta/adjusted null when var(X) is 0. */
  def cupedLift(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, convType: String, valueCol: String,
                splitDay: String, cohortCol: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    import Par.safeDiv
    val cents = round(col(valueCol) * 100).cast("long")
    val pre = when(col(typeCol) === convType &&
      to_date(col(tsCol)) < lit(splitDay).cast("date"), cents)
      .otherwise(0L)
    val post = when(col(typeCol) === convType &&
      to_date(col(tsCol)) >= lit(splitDay).cast("date"), cents)
      .otherwise(0L)
    val u = events
      .select(col(userCol).as("u"), cohortCol.cast("int").as("g"),
        pre.as("xr"), post.as("yr"))
      .groupBy($"u")
      .agg(max($"g").as("g"), sum($"xr").cast("long").as("x"),
        sum($"yr").cast("long").as("y"))
    val a = u.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when($"g" === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when($"g" === 1, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum($"x").cast("long").as("sx"),
      sum($"y").cast("long").as("sy"),
      sum(when($"g" === 0, $"x").otherwise(0L)).cast("long").as("sx_a"),
      sum(when($"g" === 1, $"x").otherwise(0L)).cast("long").as("sx_b"),
      sum(when($"g" === 0, $"y").otherwise(0L)).cast("long").as("sy_a"),
      sum(when($"g" === 1, $"y").otherwise(0L)).cast("long").as("sy_b"),
      sum(($"x".cast(DecimalType(38, 0)) * $"x")).as("sxx"),
      sum(($"x".cast(DecimalType(38, 0)) * $"y")).as("sxy"),
      sum(($"y".cast(DecimalType(38, 0)) * $"y")).as("syy"))
    val covN = $"n" * $"sxy".cast("double") -
      $"sx".cast("double") * $"sy"
    val varXN = $"n" * $"sxx".cast("double") -
      $"sx".cast("double") * $"sx"
    val varYN = $"n" * $"syy".cast("double") -
      $"sy".cast("double") * $"sy"
    val theta = covN / when(varXN > 0.0, varXN)
    // cents back to currency units (/100) at the means
    val myA = safeDiv($"sy_a".cast("double"), $"n_a".cast("double")) / 100.0
    val myB = safeDiv($"sy_b".cast("double"), $"n_b".cast("double")) / 100.0
    val mxA = safeDiv($"sx_a".cast("double"), $"n_a".cast("double")) / 100.0
    val mxB = safeDiv($"sx_b".cast("double"), $"n_b".cast("double")) / 100.0
    a.select($"n_a", $"n_b",
      (round(myA * 1e6) / 1e6).as("mean_y_a"),
      (round(myB * 1e6) / 1e6).as("mean_y_b"),
      (round((myB - myA) * 1e6) / 1e6).as("diff_raw"),
      (round(theta * 1e6) / 1e6).as("theta"),
      (round(((myB - myA) - theta * (mxB - mxA)) * 1e6) / 1e6)
        .as("diff_adj"),
      (round(covN * covN / when(varXN * varYN > 0.0, varXN * varYN)
        * 1e6) / 1e6).as("var_reduction"))
  }

  /** Minimum-detectable-effect readout for a two-arm continuous-metric
    * experiment: with the arms' OBSERVED sizes and variances, the
    * smallest true difference the test would flag at the given
    * two-sided alpha and power —
    * `MDE = (z_a/2 + z_pow) * sqrt(var_a/n_a + var_b/n_b)` — the
    * pre-readout sanity every experimenter needs ("could this test
    * even see the effect we care about?"). Per-user metrics quantize
    * to integer cents (the [[cupedLift]] rule), so both engines derive
    * the variances from identical integers; the z constants are
    * driver-computed literals interpolated into both trees.
    *
    * Shape: one user-keyed agg, then ONE 1-row conditional power-sum
    * aggregate. Output: 1 row (n_a, n_b, mean_a, mean_b, mde_abs,
    * mde_rel); null when an arm has < 2 users or the pooled mean is
    * 0. */
  def mdeReadout(events: DataFrame, userCol: String, typeCol: String,
                 convType: String, valueCol: String, cohortCol: Column,
                 zAlpha: Double = 1.959964,
                 zPower: Double = 0.841621): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    import Par.safeDiv
    val cents = when(col(typeCol) === convType,
      round(col(valueCol) * 100).cast("long")).otherwise(0L)
    val u = events
      .select(col(userCol).as("u"), cohortCol.cast("int").as("g"),
        cents.as("xr"))
      .groupBy($"u")
      .agg(max($"g").as("g"), sum($"xr").cast("long").as("x"))
    def arm(g: Int, sfx: String) = Seq(
      sum(when($"g" === g, 1L).otherwise(0L)).cast("long").as(s"n_$sfx"),
      sum(when($"g" === g, $"x").otherwise(0L)).cast("long").as(s"sx_$sfx"),
      sum(when($"g" === g, ($"x".cast(DecimalType(38, 0)) * $"x"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as(s"sxx_$sfx"))
    val aggs = arm(0, "a") ++ arm(1, "b")
    val a = u.agg(aggs.head, aggs.tail: _*)
    def variance(sfx: String): Column = {
      val n = col(s"n_$sfx"); val sx = col(s"sx_$sfx")
      val sxx = col(s"sxx_$sfx")
      (n * sxx.cast("double") - sx.cast("double") * sx) /
        when(n * (n - 1L) > 0L, n * (n - 1L)).cast("double")
    }
    def mean(sfx: String): Column =
      safeDiv(col(s"sx_$sfx").cast("double"),
        col(s"n_$sfx").cast("double")) / 100.0
    val mde = (lit(zAlpha + zPower) *
      sqrt(variance("a") / when($"n_a" > 0L, $"n_a").cast("double") +
        variance("b") / when($"n_b" > 0L, $"n_b").cast("double"))) / 100.0
    val pooled = safeDiv(($"sx_a" + $"sx_b").cast("double"),
      ($"n_a" + $"n_b").cast("double")) / 100.0
    a.select($"n_a", $"n_b",
      (round(mean("a") * 1e6) / 1e6).as("mean_a"),
      (round(mean("b") * 1e6) / 1e6).as("mean_b"),
      (round(mde * 1e6) / 1e6).as("mde_abs"),
      (round(mde / when(pooled > 0.0, pooled) * 1e6) / 1e6).as("mde_rel"))
  }

  /** Sample-ratio-mismatch check: the experiment-health gate that must
    * run before ANY readout is believed — if the hash split assigns
    * users measurably off the expected ratio, the assignment itself is
    * broken (redirect bugs, bot filtering one arm) and every
    * downstream metric is garbage. Chi-square of the observed arm
    * sizes against the expected split on 1 dof; flag past the 95%
    * critical value 3.841459. Exact integer counts; one distinct-user
    * pass, then a 1-row aggregate. Output: 1 row (n_a, n_b, chi2,
    * srm). */
  def srmCheck(events: DataFrame, userCol: String, cohortCol: Column,
               expectedA: Double = 0.5): DataFrame = {
    require(expectedA > 0.0 && expectedA < 1.0,
      "expectedA must lie in (0, 1)")
    val spark = events.sparkSession
    import spark.implicits._
    val u = events
      .select(col(userCol).as("u"), cohortCol.cast("int").as("g"))
      .groupBy($"u").agg(max($"g").as("g"))
    val a = u.agg(
      sum(when($"g" === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when($"g" === 1, 1L).otherwise(0L)).cast("long").as("n_b"))
    val tot = ($"n_a" + $"n_b").cast("double")
    val ea = tot * lit(expectedA)
    val eb = tot * lit(1.0 - expectedA)
    val chi2 = ($"n_a" - ea) * ($"n_a" - ea) / when(ea > 0.0, ea) +
      ($"n_b" - eb) * ($"n_b" - eb) / when(eb > 0.0, eb)
    a.select($"n_a", $"n_b",
      (round(chi2 * 1e6) / 1e6).as("chi2"),
      (chi2 > 3.841459).as("srm"))
  }

  /** Post-stratified A/B difference: the arm diff reweighted so every
    * stratum counts by its OVERALL share — w_s (mean_b,s - mean_a,s)
    * summed over strata — the weighting complement to [[cupedLift]]
    * (CUPED removes pre-period variance; post-stratification removes
    * the bias a lopsided stratum mix injects when randomization is
    * imperfect or the readout slices late). Strata present in only one
    * arm have an undefined diff and are EXCLUDED from the adjusted sum
    * (their weight reports in `w_excluded` so the exclusion is
    * visible, never silent). Metrics quantize to integer cents (the
    * q238 rule).
    *
    * Shape: one user-keyed agg, one stratum-keyed conditional agg
    * (dictionary-sized), ONE 1-row rollup. Output: 1 row (n_a, n_b,
    * diff_raw, diff_post, n_strata, w_excluded). */
  def postStratifiedDiff(events: DataFrame, userCol: String,
                         typeCol: String, convType: String,
                         valueCol: String, cohortCol: Column,
                         stratumCol: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import Par.safeDiv
    val cents = when(col(typeCol) === convType,
      round(col(valueCol) * 100).cast("long")).otherwise(0L)
    val u = events
      .select(col(userCol).as("u"), cohortCol.cast("int").as("g"),
        stratumCol.cast("string").as("s"), cents.as("xr"))
      .groupBy($"u")
      .agg(max($"g").as("g"), max($"s").as("s"),
        sum($"xr").cast("long").as("y"))
    val st = u.groupBy($"s").agg(
      sum(when($"g" === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when($"g" === 1, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when($"g" === 0, $"y").otherwise(0L)).cast("long").as("sy_a"),
      sum(when($"g" === 1, $"y").otherwise(0L)).cast("long").as("sy_b"))
    val d = safeDiv($"sy_b".cast("double"), $"n_b".cast("double")) -
      safeDiv($"sy_a".cast("double"), $"n_a".cast("double"))
    val roll = st.agg(
      sum($"n_a").cast("long").as("n_a"),
      sum($"n_b").cast("long").as("n_b"),
      sum($"sy_a").cast("long").as("sy_a"),
      sum($"sy_b").cast("long").as("sy_b"),
      count(lit(1)).cast("long").as("n_strata"),
      // per-stratum weight = its share of ALL users; a null stratum
      // diff (one-armed stratum) drops out of sum() in both engines
      sum(($"n_a" + $"n_b").cast("double") * d).as("wsum"),
      sum(when($"n_a" === 0L || $"n_b" === 0L, $"n_a" + $"n_b")
        .otherwise(0L)).cast("long").as("n_excluded"))
    roll.select($"n_a", $"n_b",
      (round((safeDiv($"sy_b".cast("double"), $"n_b".cast("double")) -
        safeDiv($"sy_a".cast("double"), $"n_a".cast("double"))) / 100.0
        * 1e6) / 1e6).as("diff_raw"),
      (round(safeDiv($"wsum", ($"n_a" + $"n_b").cast("double")) / 100.0
        * 1e6) / 1e6).as("diff_post"),
      $"n_strata",
      (round(safeDiv($"n_excluded".cast("double"),
        ($"n_a" + $"n_b").cast("double")) * 1e6) / 1e6)
        .as("w_excluded"))
  }

  /** Session exit analysis: per event type, how many gap-sessions
    * CONTAIN it vs END on it — exit rate = ended / contained, the
    * "where do sessions die" readout that ranks the last thing users
    * saw before leaving (the q228 abandonment signal generalized from
    * one funnel pair to every type). Sessions are the q54 gap rule
    * ((ts, id)-ordered per user, new session after `gapMinutes` of
    * silence); a session's exit is its LAST event, ties by id.
    *
    * Shape: one per-user window sort assigns session ids, the exit is
    * a max_by hash agg per session (no second window), containment is
    * a (session, type)-distinct agg, and the final join runs over the
    * type dictionary. Output: (event_type, n_sessions, n_exits,
    * exit_rate). */
  def exitRates(events: DataFrame, userCol: String, tsCol: String,
                idCol: String, typeCol: String,
                gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes >= 1, "gapMinutes must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import Par.safeDiv
    val e = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(idCol).as("eid"), col(typeCol).as("t"))
    val byUser = Window.partitionBy($"u").orderBy($"ts", $"eid")
    val gapUs = gapMinutes * 60L * 1000000L
    val newS = when(lag($"ts", 1).over(byUser).isNull ||
      unix_micros($"ts") -
        unix_micros(lag($"ts", 1).over(byUser)) > gapUs, 1)
      .otherwise(0)
    val sess = e.withColumn("sid", sum(newS).over(
      byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val exits = sess.groupBy($"u", $"sid")
      .agg(max_by($"t", struct($"ts", $"eid")).as("t"))
      .groupBy($"t").agg(count(lit(1)).cast("long").as("n_exits"))
    val contains = sess.select($"u", $"sid", $"t").distinct()
      .groupBy($"t").agg(count(lit(1)).cast("long").as("n_sessions"))
    contains.join(exits, Seq("t"), "left")
      .select($"t".as("event_type"), $"n_sessions",
        coalesce($"n_exits", lit(0L)).as("n_exits"),
        (round(safeDiv(coalesce($"n_exits", lit(0L)).cast("double"),
          $"n_sessions".cast("double")) * 1e6) / 1e6).as("exit_rate"))
  }

  /** First-order Markov next-event model, trained and EVALUATED: build
    * the per-from-state argmax transition model on the pre-`splitDay`
    * feed, predict every post-split transition, report accuracy per
    * from-state — the eval loop a transition matrix (q177) feeds (a
    * model is only as good as its held-out hit rate). Transitions are
    * consecutive same-user events within one period, ordered by
    * (ts, id) so timestamp ties break deterministically; boundary-
    * crossing transitions belong to neither period. Argmax ties go to
    * the smallest successor (the label-propagation total order). A
    * test from-state unseen in training predicts null and scores 0.
    *
    * Shape: per-user lead windows over each period's feed (one sort
    * per period), a transition-dictionary-sized model aggregate, its
    * argmax as a min_by hash agg (no windows over volume), then one
    * broadcast join of test transitions against the model. Output:
    * (from_s, n_test, n_correct, predicted, accuracy). */
  def markovAccuracy(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String, typeCol: String,
                     splitDay: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def transitions(pred: Column): DataFrame = {
      val w = Window.partitionBy($"u").orderBy($"ts", $"eid")
      events.filter(pred)
        .select(col(userCol).as("u"), col(tsCol).as("ts"),
          col(idCol).as("eid"), col(typeCol).as("s"))
        .withColumn("nxt", lead($"s", 1).over(w))
        .filter($"nxt".isNotNull)
        .select($"s".as("from_s"), $"nxt".as("to_s"))
    }
    val isPre = to_date(col(tsCol)) < lit(splitDay).cast("date")
    val model = transitions(isPre)
      .groupBy($"from_s", $"to_s")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .groupBy($"from_s")
      .agg(min_by($"to_s", struct((-$"cnt").as("nc"), $"to_s"))
        .as("predicted"))
    transitions(!isPre)
      .join(broadcast(model), Seq("from_s"), "left")
      .groupBy($"from_s")
      .agg(count(lit(1)).cast("long").as("n_test"),
        sum(when($"to_s" === $"predicted", 1L).otherwise(0L))
          .cast("long").as("n_correct"),
        max($"predicted").as("predicted"))
      .withColumn("accuracy",
        round(Par.safeDiv($"n_correct".cast("double"),
          $"n_test".cast("double")) * 1e6) / 1e6)
  }

  /** Kaplan-Meier retention curve over user LIFETIMES: a user's
    * lifetime is the day span from first to last activity; the churn is
    * OBSERVED when the last activity predates the feed's final day, and
    * CENSORED (still alive at cutoff) otherwise — the textbook
    * right-censoring the naive "averaging observed lifetimes" estimate
    * gets wrong. At each distinct observed-churn lifetime t:
    * `S(t) = prod over t_i <= t of (1 - d_i / n_i)` with `n_i` the
    * users still at risk (lifetime >= t_i, censored included).
    *
    * Scale shape: the feed compresses to (user, day)-distinct rows,
    * then to one row per user, then to one row per DISTINCT lifetime —
    * every window thereafter runs over that bounded lifetime table.
    * The product accumulates as `exp(sum(ln(1 - d/n)))` with the
    * identical expression in the SQL oracle.
    *
    * Output: (t_days, n_risk, n_churned, survival) per distinct
    * observed-churn lifetime, survival rounded 6. */
  def kaplanMeier(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val life = days.groupBy($"u")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
    val gmax = days.agg(max($"d").as("gmax"))
    val lt = life.crossJoin(broadcast(gmax))
      .select(datediff($"d1", $"d0").cast("long").as("t"),
        ($"d1" < $"gmax").as("observed"))
    val byT = lt.groupBy($"t")
      .agg(count(lit(1)).cast("long").as("n_at"),
        sum(when($"observed", 1L).otherwise(0L)).cast("long")
          .as("n_churned"))
    val wRisk = Window.orderBy($"t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, 0)
    // the window input is the distinct-lifetime table — bounded by the
    // feed's day span, so the single-partition window is a scalar job
    // a lifetime where EVERYONE at risk churns drives its factor to 0
    // and the curve to exactly 0 from there on — pinned explicitly (an
    // ln(0) would ride engine-specific -inf semantics)
    val f = lit(1.0) - $"n_churned".cast("double") /
      col("n_risk").cast("double")
    byT
      .withColumn("n_risk", sum($"n_at").over(wRisk))
      .withColumn("hit0", max(when(f <= 0.0, 1).otherwise(0)).over(wCum))
      .withColumn("survival",
        when($"hit0" === 1, 0.0).otherwise(round(exp(sum(
          when(f > 0.0, log(f)).otherwise(lit(0.0))).over(wCum)), 6)))
      .filter($"n_churned" > 0)
      .select($"t".as("t_days"), $"n_risk", $"n_churned", $"survival")
  }

  /** Nelson-Aalen cumulative hazard over the same right-censored user
    * lifetimes as [[kaplanMeier]]: `H(t) = sum over t_i <= t of
    * d_i / n_i`, with the Aalen variance `sum of d_i / n_i^2` and the
    * Fleming-Harrington survival `exp(-H)` — the estimator of choice
    * when the HAZARD (instantaneous churn pressure) is the quantity
    * under study rather than the survival curve, and the numerically
    * gentler one near small risk sets (no product hitting exact 0).
    *
    * Scale shape: identical to [[kaplanMeier]] — the feed compresses
    * to (user, day)-distinct rows, one row per user, one row per
    * DISTINCT observed-churn lifetime; the cumulative windows run over
    * that bounded lifetime table only. Per-step terms round to 9
    * places and sum as scaled integers, so both engines accumulate
    * identical integers. Output: (t_days, n_risk, n_churned,
    * cum_hazard, hazard_var, fh_survival), rounded 6. */
  def nelsonAalen(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val life = days.groupBy($"u")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
    val gmax = days.agg(max($"d").as("gmax"))
    val lt = life.crossJoin(broadcast(gmax))
      .select(datediff($"d1", $"d0").cast("long").as("t"),
        ($"d1" < $"gmax").as("observed"))
    val byT = lt.groupBy($"t")
      .agg(count(lit(1)).cast("long").as("n_at"),
        sum(when($"observed", 1L).otherwise(0L)).cast("long")
          .as("n_churned"))
    val wRisk = Window.orderBy($"t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val hTerm = round($"n_churned".cast("double") /
      $"n_risk".cast("double") * 1e9).cast("long")
    val vTerm = round($"n_churned".cast("double") /
      ($"n_risk".cast("double") * $"n_risk") * 1e9).cast("long")
    byT
      .withColumn("n_risk", sum($"n_at").over(wRisk))
      .withColumn("cum_hazard",
        round(sum(hTerm).over(wCum) / 1e9, 6))
      .withColumn("hazard_var",
        round(sum(vTerm).over(wCum) / 1e9, 6))
      .withColumn("fh_survival",
        round(exp(-sum(hTerm).over(wCum) / 1e9), 6))
      .filter($"n_churned" > 0)
      .select($"t".as("t_days"), $"n_risk", $"n_churned",
        $"cum_hazard", $"hazard_var", $"fh_survival")
  }

  /** Log-rank test between two arms' survival over the [[kaplanMeier]]
    * right-censored lifetimes: at each distinct observed-churn time,
    * arm A's observed churns compare against the hypergeometric
    * expectation `d * nA / n` with variance
    * `d * (nA/n) * (1 - nA/n) * (n-d)/(n-1)`; `z = (O - E) / sqrt(V)`
    * and `chi2 = z^2` on 1 dof — THE standard "do these cohorts churn
    * differently" test, which eyeballing two KM curves cannot answer
    * (crossing curves, unequal censoring). `armPred` must be
    * deterministic per user (e.g. `user_id % 2 = 0`).
    *
    * Scale shape: the feed compresses to (user, day)-distinct rows,
    * one row per user, then per (arm, distinct-lifetime) — the risk
    * sets are reverse-cumulative windows over that bounded grid,
    * zero-filled by an arm x lifetime completion (2 x grid rows).
    * Per-time E and V terms round to 9 and sum as scaled integers.
    * Output: 1 row (n_times, o_a, e_a, v, z, chi2, significant at
    * alpha = 0.05 / chi2 > 3.841459). */
  def logRankTest(events: DataFrame, userCol: String, tsCol: String,
                  armPred: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"),
        when(armPred, 1L).otherwise(0L).as("arm"))
      .groupBy($"u", $"d").agg(max($"arm").as("arm"))
    val life = days.groupBy($"u")
      .agg(min($"d").as("d0"), max($"d").as("d1"),
        max($"arm").as("arm"))
    val gmax = days.agg(max($"d").as("gmax"))
    val lt = life.crossJoin(broadcast(gmax))
      .select(datediff($"d1", $"d0").cast("long").as("t"),
        ($"d1" < $"gmax").as("observed"), $"arm")
    // arm x distinct-lifetime completion so both risk windows see
    // every time point (a lifetime present in one arm only would
    // otherwise shift the other arm's reverse cumsum)
    val byTA = lt.groupBy($"t", $"arm")
      .agg(count(lit(1)).cast("long").as("n_at"),
        sum(when($"observed", 1L).otherwise(0L)).cast("long")
          .as("d"))
    val grid = byTA.select($"t").distinct()
      .crossJoin(broadcast(spark.range(2).select($"id".as("arm"))))
    val full = grid.join(byTA, Seq("t", "arm"), "left")
      .select($"t", $"arm", coalesce($"n_at", lit(0L)).as("n_at"),
        coalesce($"d", lit(0L)).as("d"))
    val wRisk = Window.partitionBy($"arm").orderBy($"t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val r = full.withColumn("n_risk", sum($"n_at").over(wRisk))
    val byT = r.groupBy($"t")
      .agg(sum($"d").cast("long").as("dt"),
        sum($"n_risk").cast("long").as("nt"),
        sum(when($"arm" === 1L, $"d").otherwise(0L)).cast("long")
          .as("da"),
        sum(when($"arm" === 1L, $"n_risk").otherwise(0L)).cast("long")
          .as("na"))
      .filter($"dt" > 0L)
    val pa = $"na".cast("double") / $"nt".cast("double")
    val eTerm = round($"dt".cast("double") * pa * 1e9).cast("long")
    val vTerm = round(when($"nt" > 1L,
      $"dt".cast("double") * pa * (lit(1.0) - pa) *
        ($"nt" - $"dt").cast("double") / ($"nt" - 1L).cast("double"))
      .otherwise(lit(0.0)) * 1e9).cast("long")
    val agg = byT.agg(
      count(lit(1)).cast("long").as("n_times"),
      sum($"da").cast("long").as("o_a"),
      (round(sum(eTerm) / 1e9 * 1e6) / 1e6).as("e_a"),
      (round(sum(vTerm) / 1e9 * 1e6) / 1e6).as("v"))
    val z = ($"o_a".cast("double") - $"e_a") /
      when($"v" > 0.0, sqrt($"v"))
    agg.select($"n_times", $"o_a", $"e_a", $"v",
      (round(z * 1e6) / 1e6).as("z"),
      (round(z * z * 1e6) / 1e6).as("chi2"))
      .withColumn("significant", $"chi2" > 3.841459)
  }

  /** Time-weighted average value per (type, day) — TWAP: each
    * observation holds until the next one of its type that day (last
    * one holds to midnight), and the average weights each value by its
    * holding duration in EXACT integer microseconds — the correct
    * "average price/level over the day" when observations arrive
    * unevenly, where a row-average over-weights bursts.
    *
    * Scale shape: the lead window partitions by (type, DAY) — bounded
    * partitions that parallelize over the calendar, never the per-type
    * full-history funnel a (type)-only partition would be. Durations
    * are exact long microseconds; the only floats are the value*dur
    * products and one final division, rounded 6.
    *
    * Output: (group, day, n, twap) — day as 'yyyy-MM-dd'. */
  def twap(events: DataFrame, typeCol: String, tsCol: String,
           valueCol: String, idCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(typeCol), col("__day"))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__day", to_date(col(tsCol)))
      .withColumn("__end", coalesce(
        lead(col(tsCol), 1).over(w),
        (col("__day") + lit(1)).cast("timestamp")))
      .withColumn("__dur",
        unix_micros(col("__end")) - unix_micros(col(tsCol)))
      .groupBy(col(typeCol), col("__day").as("day"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(sum(col(valueCol) * col("__dur").cast("double")) /
          sum(col("__dur")).cast("double"), 6).as("twap"))
      .select(col(typeCol), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("twap"))
  }

  /** First-order Markov transition matrix between event types: for each
    * user's time-ordered event sequence, count cur->next adjacent pairs
    * and normalize per source state — P(next | cur), the behavioral
    * fingerprint behind journey analysis and synthetic-session
    * generation (and, read as a matrix, the input to the q173-style
    * stationary analysis).
    *
    * Scale shape: the ONLY per-event work is one `lead` window inside
    * each user's own partition ordered by (ts, id) — the q54
    * sessionization shape, parallel across users — after which
    * everything is a states x states table. Ordering ties break on the
    * id so both engines walk identical sequences.
    *
    * Output: (cur, next, n, p) — p = n / sum(n per cur), rounded 6. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(typeCol).as("cur"),
        lead(col(typeCol), 1).over(w).as("next"))
      .filter($"next".isNotNull)
      .groupBy($"cur", $"next")
      .agg(count(lit(1)).cast("long").as("n"))
    val totals = pairs.groupBy($"cur".as("__tm_cur"))
      .agg(sum($"n").cast("long").as("tot"))
    pairs.join(broadcast(totals), $"cur" === $"__tm_cur")
      .select($"cur", $"next", $"n",
        round($"n".cast("double") / $"tot".cast("double"), 6).as("p"))
  }

  /** Top event-type JOURNEY n-grams: the most frequent length-`n` runs
    * of consecutive event types within a user's time-ordered sequence —
    * the Sankey/path-analysis input one step deeper than
    * [[transitionMatrix]]'s pairs (a->b->c distinguishes checkout flows
    * from bounce loops that a 2-gram matrix blurs together).
    *
    * Scale shape: `n-1` lead windows inside each user's own partition
    * (one window SPEC, the q54 shape — per-user sequences parallelize),
    * then a (path)-keyed count and a `rank <= k` filter the optimizer
    * rewrites to a per-partition group limit (WindowGroupLimit: each
    * task keeps its own top-k before the single k-sized merge) — the
    * path table never fully sorts through one task. Ties break on the
    * path string so both engines cut the same top-k.
    *
    * Output: (rank, path, n_occurrences) — path as " > "-joined types. */
  def topJourneys(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String, n: Int = 3,
                  k: Int = 20): DataFrame = {
    require(n >= 2 && k >= 1, "need n >= 2 and k >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val steps = (0 until n).map {
      case 0 => col(typeCol)
      case i => lead(col(typeCol), i).over(w)
    }
    // complete = EVERY step non-null, not just the last: a NULL type
    // value mid-run would otherwise slip through (concat_ws silently
    // drops nulls, so the row would count as a shorter path) and
    // diverge from the oracle's null-propagating || concatenation
    val paths = events
      .select(concat_ws(" > ", steps: _*).as("path"),
        steps.map(_.isNotNull).reduce(_ && _).as("complete"))
      .filter($"complete")
      .groupBy($"path")
      .agg(count(lit(1)).cast("long").as("n_occurrences"))
    val wr = Window.orderBy($"n_occurrences".desc, $"path")
    paths
      .withColumn("rank", row_number().over(wr).cast("int"))
      .filter($"rank" <= k)
      .select($"rank", $"path", $"n_occurrences")
  }

  /** Time-to-convert distribution: for each user whose first `endType`
    * event follows their first `startType` event, the latency between
    * the two — summarized as count + p50/p90/p99 minutes. The
    * conversion-RATE funnel ([[funnel]]) says how many make it; this
    * says how long the ones who make it take — the pair every growth
    * dashboard shows together.
    *
    * Scale shape: two user-keyed min-aggs (one per step type slice)
    * joined user-keyed, then ONE percentile row over the converting-user
    * latencies (state bounded by distinct latency values); latencies are
    * exact integer microseconds, minutes one division, percentiles rounded 6
    * at the aggregation.
    *
    * Output: 1 row (n_converted, p50_minutes, p90_minutes,
    * p99_minutes). */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, startType: String,
                    endType: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val s0 = events.filter(col(typeCol) === startType)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t0"))
    val s1 = events.filter(col(typeCol) === endType)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t1"))
    s0.join(s1, Seq("u"))
      .filter($"t1" > $"t0")
      .select(((unix_micros($"t1") - unix_micros($"t0"))
        .cast("double") / 60000000.0).as("mins"))
      .agg(count(lit(1)).cast("long").as("n_converted"),
        round(expr("percentile(mins, 0.5)"), 6).as("p50_minutes"),
        round(expr("percentile(mins, 0.9)"), 6).as("p90_minutes"),
        round(expr("percentile(mins, 0.99)"), 6).as("p99_minutes"))
  }

  /** Touch attribution for conversions: each `convType` event finds its
    * user's `touchType` events in the `windowDays` lookback, and the
    * summary carries the three standard credit models at once —
    * FIRST-touch (earliest touch id), LAST-touch (latest), and the
    * LINEAR share (value / n_touches each touch would receive).
    * Conversions with no in-window touch keep a row (null ids, zero
    * touches) — unattributed revenue is a number the report needs, not
    * a dropped row.
    *
    * Scale shape: one user-keyed equi join with the time bracket as a
    * join-side filter (candidates per conversion = that user's
    * in-window touches, never a cross of the feed), then a per-
    * conversion aggregate whose first/last picks are `min_by`/`max_by`
    * over a (ts, id) struct — deterministic under timestamp ties, no
    * per-conversion sort. The oracle replays the same argmin/argmax on
    * an (epoch, id) list key.
    *
    * The candidate bound is data-dependent: a user with C conversions
    * and T in-window touches joins C*T rows, so one bot user with 10^4
    * of each pays 10^8 — `maxTouchesPerWindow` is the safety valve.
    * When set, each user's touch feed keeps only the LATEST N touches
    * per windowDays-sized time bucket (one touch-side window sort,
    * partitioned (user, bucket) — never a per-conversion sort), so a
    * conversion window, which spans at most 2 buckets, joins <= 2N
    * candidates. Under an engaged cap EVERY output field is
    * approximate for over-cap (user, bucket) slices: n_touches /
    * linear_share become lower / upper bounds, and first/last touch
    * may both miss — the kept set is bucket-recency-ranked without
    * regard to any conversion's bracket, so touches AFTER a conversion
    * can evict that conversion's in-window touches (a bot user
    * clicking past their purchase). Users whose buckets stay within N
    * touches are exact. Default = uncapped, exact.
    *
    * Output: (conv_id, user, value, n_touches, first_touch_id,
    * last_touch_id, linear_share) — share rounded 6, null when no
    * touches. */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String, valueCol: String,
                  convType: String, touchType: String,
                  windowDays: Int = 7,
                  maxTouchesPerWindow: Int = Int.MaxValue): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    require(maxTouchesPerWindow >= 1, "maxTouchesPerWindow must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol).as("u"),
        col(tsCol).as("pts"), col(valueCol).as("value"))
    val touchAll = events.filter(col(typeCol) === touchType)
      .select(col(idCol).as("touch_id"), col(userCol).as("u"),
        col(tsCol).as("cts"))
    val touch =
      if (maxTouchesPerWindow == Int.MaxValue) touchAll // exact path: no sort
      else {
        val bucketMicros = windowDays.toLong * 86400000000L
        touchAll
          .withColumn("bkt", floor(unix_micros($"cts") / bucketMicros))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"u", $"bkt")
              .orderBy($"cts".desc, $"touch_id".desc)))
          .filter($"rn" <= maxTouchesPerWindow)
          .drop("bkt", "rn")
      }
    conv
      .join(touch, conv("u") === touch("u") &&
        $"cts" <= $"pts" &&
        $"cts" >= $"pts" - expr(s"INTERVAL $windowDays DAYS"), "left")
      .groupBy($"conv_id", conv("u").as("user"), $"pts", $"value")
      .agg(count($"touch_id").cast("long").as("n_touches"),
        min_by($"touch_id", struct($"cts", $"touch_id"))
          .as("first_touch_id"),
        max_by($"touch_id", struct($"cts", $"touch_id"))
          .as("last_touch_id"))
      .select($"conv_id", $"user", $"value", $"n_touches",
        $"first_touch_id", $"last_touch_id",
        round(Par.safeDiv($"value", $"n_touches".cast("double")), 6)
          .as("linear_share"))
  }

  /** Cohort retention matrix: users cohorted by their FIRST active day,
    * counted once per (cohort, day-offset) they return on. The output is
    * the (cohort_day, day_offset, n_active, cohort_size, retention)
    * triangle — day_offset 0 rows carry retention 1.0 by construction.
    *
    * Scale shape: the first-day table is one user-keyed min-agg; tagging
    * activity days is a user-keyed join of the (user, day)-distinct
    * activity table (already compressed from event volume by its own
    * partial agg); cohort sizes are a dictionary-sized table joined back
    * by cohort day. Nothing holds more than (users x active days) rows,
    * and nothing sorts. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val firstDay = days.groupBy($"u").agg(min($"d").as("cohort_day"))
    val active = days.join(firstDay, Seq("u"))
      .select($"u", $"cohort_day", datediff($"d", $"cohort_day").as("day_offset"))
    val cohortSize = firstDay.groupBy($"cohort_day")
      .agg(count(lit(1)).cast("long").as("cohort_size"))
    active.groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).cast("long").as("n_active"))
      .join(cohortSize, Seq("cohort_day"))
      .select($"cohort_day", $"day_offset", $"n_active", $"cohort_size",
        round($"n_active".cast("double") / $"cohort_size".cast("double"), 6)
          .as("retention"))
  }

  /** Lag-feature builder over a keyed series — the feature matrix a
    * forecasting / anomaly model trains on: per (key, x) row, the
    * previous values at each requested lag, the trailing moving
    * average, and the step-over-step relative change. Leading rows
    * whose lag reaches before the series keep null features (a model
    * pipeline masks them; fabricating zeros would teach the model the
    * series started at zero).
    *
    * One key-partitioned window sort serves every feature — lags and
    * the trailing mean share the same ordering, so this is ONE
    * exchange + ONE sort however many lags are asked for. The moving
    * average divides by the ACTUAL trailing row count (partial windows
    * average what exists). Output: (key, x, y, lag_L..., ma_W,
    * pct_change), doubles rounded 6. */
  def lagFeatures(series: DataFrame, keyCol: String, xCol: String,
                  yCol: String, lags: Seq[Int] = Seq(1, 7),
                  maWindow: Int = 7): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1) && maWindow >= 1,
      "need positive lags and maWindow >= 1")
    val spark = series.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(xCol))
    val wMa = w.rowsBetween(-(maWindow - 1), Window.currentRow)
    val lagCols = lags.map(l =>
      lag(col(yCol), l).over(w).as(s"lag_$l"))
    val base = series.select(
      (Seq(col(keyCol), col(xCol), col(yCol)) ++ lagCols ++ Seq(
        (round(sum(col(yCol)).over(wMa).cast("double") /
          count(lit(1)).over(wMa) * 1e6) / 1e6).as(s"ma_$maWindow"))): _*)
    val l1 = col(s"lag_${lags.min}")
    base.withColumn("pct_change",
      round((col(yCol).cast("double") /
        when(l1 > 0, l1).cast("double") - lit(1.0)) * 1e6) / 1e6)
  }

  /** Abandonment detector — the funnel NEGATIVE: a view (cart-add,
    * trial-start) counts as abandoned when the same user records NO
    * conversion within `windowMinutes` after it; the complement of
    * click attribution (q189/q192 join conversions BACK to touches,
    * this op finds the touches nothing ever joined). Per-user rollup:
    * view count, abandoned count, abandonment rate.
    *
    * Shape: one user-keyed equi join with the time bracket as a join
    * filter (the q192 pattern — candidates per view are bounded by the
    * user's conversions inside the window), then a per-view existence
    * agg and a user rollup. A view with zero joined conversions is
    * exactly the abandoned case, so the left join's null row IS the
    * signal — no NOT EXISTS subquery, no anti-join over raw volume.
    * Output: (user, n_views, n_abandoned, abandon_rate). */
  def abandonment(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, viewType: String, convType: String,
                  typeCol: String = "event_type",
                  windowMinutes: Int = 30): DataFrame = {
    require(windowMinutes >= 1, "need windowMinutes >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val v = events.filter(col(typeCol) === viewType)
      .select(col(userCol).as("u"), col(idCol).as("view_id"),
        col(tsCol).as("vts"))
    val p = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(tsCol).as("pts"))
    val joined = v.join(p,
      v("u") === p("u") && $"pts" >= $"vts" &&
        $"pts" <= $"vts" + expr(s"INTERVAL $windowMinutes MINUTES"),
      "left")
      .select(v("u").as("u"), $"view_id", $"pts")
    val perView = joined.groupBy($"u", $"view_id")
      .agg((count($"pts") === 0L).as("abandoned"))
    perView.groupBy($"u".as("user"))
      .agg(count(lit(1)).cast("long").as("n_views"),
        sum(when($"abandoned", 1L).otherwise(0L)).cast("long")
          .as("n_abandoned"))
      .select($"user", $"n_views", $"n_abandoned",
        (round($"n_abandoned".cast("double") /
          when($"n_views" > 0L, $"n_views").cast("double") * 1e6) / 1e6)
          .as("abandon_rate"))
  }

  /** RFM segmentation over an order feed: per customer, recency (days
    * since last order, measured from the feed's max date), frequency
    * (order count) and monetary (total spend), each scored into `q`
    * quantile buckets — the classic lifecycle segmentation (5-5-5 =
    * recent, frequent, big spender). Bucket boundaries are the exact
    * percentile cut points of each metric's own distribution computed
    * as ONE broadcast row (the q116 quantileBuckets rule: bucket =
    * 1 + thresholds passed, map-side — no single-task ntile sort over
    * the customer table). Monetary quantizes once
    * (`round(amount * amountScale)`) so sums are integer-exact.
    *
    * Bucket semantics are the metric's NATURAL order: r_score 1 = most
    * recent, f_score/m_score 5 = most frequent / biggest. Output:
    * (custkey, recency_days, frequency, monetary, r_score, f_score,
    * m_score). */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
                  amountCol: String, q: Int = 5,
                  amountScale: Long = 100L): DataFrame = {
    require(q >= 2, "q must be >= 2")
    val spark = orders.sparkSession
    import spark.implicits._
    val mx = orders.agg(max(to_date(col(dateCol))).as("mxd"))
    val perCust = orders
      .filter(col(custCol).isNotNull && col(dateCol).isNotNull &&
        col(amountCol).isNotNull)
      .crossJoin(broadcast(mx))
      .groupBy(col(custCol).as("custkey"))
      .agg(
        // recency = days since the LAST order: the minimum gap to mxd
        min(datediff($"mxd", to_date(col(dateCol)))).cast("long")
          .as("rec"),
        count(lit(1)).cast("long").as("freq"),
        sum(round(col(amountCol) * amountScale).cast("long")).cast("long")
          .as("mon"))
    val ps = (1 until q).map(i => i / q.toDouble).mkString(", ")
    val thr = perCust.agg(
      expr(s"percentile(rec, array($ps))").as("tr0"),
      expr(s"percentile(freq, array($ps))").as("tf0"),
      expr(s"percentile(mon, array($ps))").as("tm0"))
      .select(transform($"tr0", t => round(t, 6)).as("tr"),
        transform($"tf0", t => round(t, 6)).as("tf"),
        transform($"tm0", t => round(t, 6)).as("tm"))
    def score(v: org.apache.spark.sql.Column,
              ts: org.apache.spark.sql.Column) =
      (lit(1) + aggregate(ts, lit(0),
        (acc, t) => acc + when(v > t, 1).otherwise(0))).cast("int")
    perCust.crossJoin(broadcast(thr))
      .select($"custkey", $"rec".as("recency_days"), $"freq".as("frequency"),
        (round($"mon".cast("double") / amountScale * 1e6) / 1e6)
          .as("monetary"),
        score($"rec", $"tr").as("r_score"),
        score($"freq", $"tf").as("f_score"),
        score($"mon", $"tm").as("m_score"))
  }

  /** Delta-method comparison of a RATIO metric between two arms —
    * revenue per view, items per session, CTR: the metric shaped
    * `sum(num)/sum(den)` whose unit of randomization (the user) is not
    * its unit of analysis (the event). A per-event t-test is WRONG
    * there (correlated events within a user understate variance, the
    * classic A/B false-positive factory); the delta method puts the
    * variance on USER-level (x, y) totals:
    * `var(R) = (Sxx - 2R Sxy + R^2 Syy) / (n ybar^2)` with sample
    * (co)variances over per-unit sums — zero-denominator units
    * INCLUDED, which is the point.
    *
    * Exactness: per-unit sums quantize to scaled longs; each arm's
    * five power sums accumulate as DECIMAL(38,0) (the q144 rule) in
    * ONE grouping-free aggregate — no join, no window, one row out;
    * both engines derive z and the 95% CI through one identical IEEE
    * tree. `armPred` must be deterministic per unit (enforced like
    * q275: the unit's arm is max over its rows).
    *
    * Scale shape: raw volume stops at the per-unit keyed agg; the arm
    * rollup is 12 conditional sums with map-side partials. Arms with
    * n < 2 units or zero denominator mass null their side (and z).
    * Output: 1 row (n0, n1, ratio0, ratio1, diff, z, ci_lo, ci_hi,
    * significant). */
  def ratioMetricDelta(df: DataFrame, unitCol: String, armPred: Column,
                       num: Column, den: Column,
                       scale: Long = 100L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val perUnit = Par.ensure(df)
      .select(col(unitCol).as("u"),
        round(num * scale).cast("long").as("xr"),
        round(den * scale).cast("long").as("yr"),
        when(armPred, 1L).otherwise(0L).as("arm"))
      .groupBy($"u")
      .agg(sum($"xr").cast("long").as("x"),
        sum($"yr").cast("long").as("y"),
        max($"arm").as("arm"))
    // type coercion promotes the 0L branch to the value branch's type,
    // so one helper serves both the long and the DECIMAL power sums
    def side(a: Int, nm: String)(c: Column): Column =
      sum(when($"arm" === a.toLong, c).otherwise(lit(0L))).as(nm + a)
    val mom = perUnit.agg(
      sum(when($"arm" === 0L, 1L).otherwise(0L)).cast("long").as("n0"),
      sum(when($"arm" === 1L, 1L).otherwise(0L)).cast("long").as("n1"),
      side(0, "sx")($"x"), side(1, "sx")($"x"),
      side(0, "sy")($"y"), side(1, "sy")($"y"),
      side(0, "sxx")(dec($"x") * $"x"), side(1, "sxx")(dec($"x") * $"x"),
      side(0, "syy")(dec($"y") * $"y"), side(1, "syy")(dec($"y") * $"y"),
      side(0, "sxy")(dec($"x") * $"y"), side(1, "sxy")(dec($"x") * $"y"))
    def ratio(a: Int): Column = {
      val sy = col(s"sy$a").cast("double")
      col(s"sx$a").cast("double") / when(col(s"sy$a") > 0L, sy)
    }
    def varR(a: Int): Column = {
      val n = col(s"n$a").cast("double")
      val r = ratio(a)
      val sxx = (col(s"sxx$a").cast("double") -
        col(s"sx$a").cast("double") * col(s"sx$a") / n) /
        when(col(s"n$a") > 1L, n - 1.0)
      val syy = (col(s"syy$a").cast("double") -
        col(s"sy$a").cast("double") * col(s"sy$a") / n) /
        when(col(s"n$a") > 1L, n - 1.0)
      val sxy = (col(s"sxy$a").cast("double") -
        col(s"sx$a").cast("double") * col(s"sy$a") / n) /
        when(col(s"n$a") > 1L, n - 1.0)
      val ybar = col(s"sy$a").cast("double") / n
      (sxx - lit(2.0) * r * sxy + r * r * syy) /
        (n * when(ybar > 0.0, ybar * ybar))
    }
    val diff = ratio(1) - ratio(0)
    val se = sqrt(when(varR(0) + varR(1) > 0.0, varR(0) + varR(1)))
    mom.select($"n0", $"n1",
      (round(ratio(0) * 1e6) / 1e6).as("ratio0"),
      (round(ratio(1) * 1e6) / 1e6).as("ratio1"),
      (round(diff * 1e6) / 1e6).as("diff"),
      (round(diff / se * 1e6) / 1e6).as("z"),
      (round((diff - lit(1.959964) * se) * 1e6) / 1e6).as("ci_lo"),
      (round((diff + lit(1.959964) * se) * 1e6) / 1e6).as("ci_hi"))
      .withColumn("significant",
        coalesce(abs($"z") > 1.959964, lit(false)))
  }
}
