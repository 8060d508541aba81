package graft.analytics

import Par.Mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/sharding operators for training-data pipelines:
  * deterministic stratified downsampling and token-budget shard packing.
  * Both are exact/deterministic (md5 thresholds, integer arithmetic) so
  * DuckDB oracles reproduce them bit-for-bit.
  */
object Sampling {

  /** Deterministic stratified sample: keep a row iff the first 8 hex chars
    * of md5(id) — a uniform 32-bit integer in disguise — fall under the
    * stratum's rate. Entirely MAP-SIDE (the rate table is a plan-time
    * literal CASE); reproducible across engines and runs, unlike
    * `df.sample` whose RNG is partitioning-dependent. Strata absent from
    * `rates` keep everything (rate 1.0). */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val bucket = substring(md5(col(idCol).cast("string")), 1, 8)
    val keep = rates.foldLeft(when(lit(false), lit(true))) {
      case (acc, (stratum, rate)) =>
        acc.when(col(stratumCol) === stratum, keepUnderRate(bucket, rate))
    }.otherwise(lit(true))
    docs.filter(keep)
  }

  /** md5-hex sampling predicate: the first 8 nibbles are a uniform 32-bit
    * integer in disguise; `bucket < hex(round(rate * 2^32))` keeps ~rate
    * of rows (string compare == numeric compare for fixed-width lowercase
    * hex). Shared with the SQL oracles via [[hexThreshold]]. */
  def hexThreshold(rate: Double): String =
    f"${math.round(rate * (1L << 32)).min((1L << 32) - 1).max(1L)}%08x"

  private def keepUnderRate(bucket: Column, rate: Double): Column =
    if (rate <= 0.0) lit(false)
    else if (rate >= 1.0) lit(true)
    else bucket < lit(hexThreshold(rate))

  /** Token-budget shard packing: assign documents (in `idCol` order) to
    * consecutive shards of ~`budgetTokens` tokens — how a corpus is cut
    * into training shards of roughly equal token mass. A document's shard
    * is its EXCLUSIVE token prefix DIV the budget.
    *
    * The prefix sum is the textbook DISTRIBUTED shape: range-partition by
    * id, per-partition running totals, then a dictionary-sized
    * per-partition offset table (one row per partition) broadcast back —
    * the only global window runs over that tiny table, never the corpus.
    * A naive `sum over (ORDER BY id)` window would funnel every row
    * through ONE task. */
  def tokenBudgetShards(docs: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    tokenPrefixes(docs, idCol, textCol)
      .select(col("doc_id"), col("n_tokens"),
              expr(s"prefix DIV $budgetTokens").as("shard"))
  }

  /** The distributed exclusive token prefix sum (doc_id, n_tokens,
    * prefix) shared by [[tokenBudgetShards]] and [[packSequences]]. */
  private def tokenPrefixes(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = Par.ensure(docs).select(
      col(idCol).as("doc_id"),
      TextAnalysis.nTokens(col(textCol)).cast("long").as("n_tokens"))
    // checkpoint AFTER the range partition: the partition-totals scan and
    // the final join must see the SAME pid assignment
    val parts = n.repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .materialized()
    val offsets = parts.groupBy($"pid").agg(sum($"n_tokens").as("pn"))
      // one row per partition: a single-partition window here is fine
      .withColumn("off",
        coalesce(sum($"pn").over(
          Window.orderBy($"pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"pid", $"off")
    val inPart = Window.partitionBy($"pid").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offsets), "pid")
      .withColumn("prefix",
        sum($"n_tokens").over(inPart) - $"n_tokens" + $"off")
      .select($"doc_id", $"n_tokens", $"prefix")
  }

  /** Fixed-length training-sequence packing: concatenate the corpus in
    * `idCol` order and cut it into sequences of exactly `seqLen` tokens —
    * the step that turns a curated corpus into the model's input
    * sequences. Each document emits one row PER SEQUENCE IT TOUCHES:
    * (doc_id, seq_id, tok_start, n_toks), where tok_start indexes into
    * the document and Σ n_toks over a seq_id is exactly seqLen (except
    * the final partial sequence). Pure integer arithmetic over the same
    * two-level distributed prefix sum as [[tokenBudgetShards]]; the span
    * explode is map-side (a doc emits ceil(n/seqLen)+1 rows at most).
    * Docs with no tokens emit nothing. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    tokenPrefixes(docs, idCol, textCol)
      .filter($"n_tokens" > 0)
      .select($"doc_id", $"n_tokens", $"prefix",
        explode(sequence(expr(s"prefix DIV $seqLen"),
                         expr(s"(prefix + n_tokens - 1) DIV $seqLen")))
          .as("seq_id"))
      .select($"doc_id", $"seq_id",
        greatest(lit(0L), $"seq_id" * seqLen - $"prefix").as("tok_start"),
        (least(($"seq_id" + 1) * seqLen - $"prefix", $"n_tokens") -
         greatest(lit(0L), $"seq_id" * seqLen - $"prefix")).as("n_toks"))
  }

  /** Exactly-k-per-stratum sample: rank each stratum's rows by
    * md5(id) (a deterministic uniform shuffle) and keep rank <= k — the
    * eval/holdout-set construction step, where "about k" (a rate) is not
    * acceptable and EXACTLY min(k, n_g) rows per stratum are. Ties in the
    * hash are broken by id, so the result is total-order deterministic.
    *
    * Scale shape — two-level bounded top-k (the TakeOrdered-and-merge
    * shape, per stratum): level 1 ranks within (stratum, input-partition)
    * — every window partition is bounded by an input partition, so ONE
    * GIANT STRATUM (even 90%+ of the corpus) spreads across all tasks
    * instead of funneling through one; level 2 merges the survivors,
    * at most k × numPartitions rows per stratum. Level-1 pruning is
    * sound because a stratum's global top-k is a subset of the union of
    * its per-partition top-k sets, for ANY partition assignment — the
    * result does not depend on `spark_partition_id`, it only bounds the
    * work. */
  def exactKPerStratum(docs: DataFrame, idCol: String, stratumCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val key = md5(col(idCol).cast("string"))
    // internal staging names: callers' columns must survive untouched
    val local = row_number().over(
      Window.partitionBy(col(stratumCol), col("__graft_pid"))
        .orderBy(key, col(idCol)))
    val global = row_number().over(
      Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol)))
    docs.withColumn("__graft_pid", spark_partition_id())
      .withColumn("__graft_local_rank", local)
      .filter(col("__graft_local_rank") <= k)
      .withColumn("__graft_sample_rank", global)
      .filter(col("__graft_sample_rank") <= k)
      .drop("__graft_pid", "__graft_local_rank", "__graft_sample_rank")
  }

  /** Temperature-weighted mixture downsampling: keep-rate for group g is
    * (n_g / n_min)^(alpha-1) — the α-temperature reweighting used to
    * rebalance multilingual/multi-domain corpora (target share ∝ n_g^α),
    * expressed downsample-only so the smallest group keeps everything and
    * no row is ever duplicated. Unlike [[stratifiedSample]] the rates are
    * DATA-DRIVEN: a group-count aggregate (k rows) and a 1-row global min
    * feed a broadcast rate table; the keep decision is the same
    * md5-threshold predicate, deterministic across engines, runs, and
    * partitionings. `round(,6)` pins the pow() result to the engines'
    * common fixed point before the threshold is derived.
    *
    * Scale shape: one partial-agg shuffle over k groups + a broadcast
    * join; the corpus itself never shuffles. */
  def temperatureSample(docs: DataFrame, idCol: String, groupCol: String,
                        alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val d = Par.ensure(docs)
    val cnt = d.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    // global min over the k-row count table: an unpartitioned window is
    // fine HERE (k = #groups, dictionary-sized) and keeps the rate table
    // a single subtree — no 1-row crossJoin, no nested-loop join
    val nmin = min(col("n")).over(Window.partitionBy())
    val rates = cnt.select(
      col(groupCol),
      round(pow(col("n").cast("double") / nmin.cast("double"),
        lit(alpha - 1.0)), 6).as("rate"))
    // first 8 md5 nibbles as a uniform 32-bit integer; keep iff it falls
    // under rate * 2^32 (numeric form of the hexThreshold predicate —
    // the threshold is a COLUMN here, not a plan-time literal)
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    // null-safe join: a null group is a stratum like any other (groupBy
    // counts it, so its rate exists) — a plain equi-join would silently
    // DROP every null-group row instead of sampling it
    val r = rates.withColumnRenamed(groupCol, "__g")
    d.join(broadcast(r), d(groupCol) <=> r("__g"))
      .filter(bucket < round(r("rate") * lit(4294967296.0)))
      .select(d.columns.map(d(_)): _*)
  }

  /** Weighted sample WITHOUT replacement (Efraimidis-Spirakis A-ES):
    * each row draws key = ln(u)/w — u the md5-uniform in (0,1] from the
    * row's id, w its weight — and the k LARGEST keys win; inclusion
    * probability is proportional to weight, one pass, no sequential
    * draws. The quality-weighted selection step ("sample 1M docs
    * proportional to score") where rate-based sampling can't hit an
    * exact k and rank-by-score alone is a biased argmax.
    *
    * Deterministic across engines/runs/partitionings: u is integer-
    * derived, the only float steps (one ln, one divide) are pinned by
    * `round(,9)` before ranking and ties break by id. Rows with null or
    * non-positive weight are excluded (zero inclusion probability).
    *
    * Scale shape: the key is MAP-SIDE; the global top-k is a bounded
    * TakeOrdered (k per partition -> k at the driver merge) — no window,
    * no global sort, no funnel. Output: input columns + `es_key`,
    * exactly min(k, eligible-rows) rows. */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") + 1.0) / lit(1152921504606846976.0)
    Par.ensure(docs)
      .filter(weight.isNotNull && weight > 0)
      .withColumn("es_key", round(log(u) / weight.cast("double"), 9))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Sliding-window token chunking: cut each document into training
    * sequences of `chunkSize` tokens starting every `stride` tokens
    * (stride < chunkSize ⇒ overlapping context windows, the standard
    * long-document treatment when truncation would discard the tail).
    * Chunk starts are 0, stride, 2·stride, … while start < n_tokens, so
    * the final chunk may be short; zero-token documents emit nothing.
    *
    * Entirely MAP-SIDE — tokenize, explode the start sequence, slice —
    * no shuffle anywhere; chunk volume is Σ ceil(n_d / stride) rows.
    * Output: (doc_id, chunk_id, tok_start, n_toks, chunk_text). */
  def chunkTokenWindows(docs: DataFrame, idCol: String, textCol: String,
                        chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    require(stride >= 1 && stride <= chunkSize,
      "stride must be in [1, chunkSize]")
    val spark = docs.sparkSession
    import spark.implicits._
    Par.ensure(docs)
      .select(col(idCol).as("doc_id"),
        Dedup.tokens(col(textCol)).as("t"))
      .withColumn("n", size($"t")).filter($"n" > 0)
      .select($"doc_id", $"t", $"n",
        explode(sequence(lit(0), $"n" - 1, lit(stride))).as("tok_start"))
      .select($"doc_id",
        ($"tok_start" / stride).cast("long").as("chunk_id"),
        $"tok_start".cast("long").as("tok_start"),
        least(lit(chunkSize), $"n" - $"tok_start").cast("long")
          .as("n_toks"),
        array_join(slice($"t", $"tok_start" + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Deterministic global corpus shuffle + sharding: order the corpus by
    * md5(id) — a reproducible uniform permutation, unlike `orderBy(rand)`
    * — and cut it into consecutive shards of `docsPerShard` documents.
    * The step that fixes a training-data order: every engine/run/
    * partitioning produces the SAME (doc → pos → shard) assignment
    * (md5 ties break by id).
    *
    * Scale shape: the same two-level distributed rank as
    * [[tokenBudgetShards]] — range-partition by the hash, rank within
    * each partition (every window partition bounded by an input
    * partition), add the dictionary-sized per-partition offset table
    * back by broadcast. No global single-task sort anywhere.
    * Output: (doc_id, pos, shard). */
  def shuffleShards(docs: DataFrame, idCol: String,
                    docsPerShard: Long): DataFrame = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val n = Par.ensure(docs).select(col(idCol).as("doc_id"),
      md5(col(idCol).cast("string")).as("h"))
    // checkpoint AFTER the range partition: the partition-totals scan and
    // the final join must see the SAME pid assignment
    val parts = n.repartitionByRange($"h", $"doc_id")
      .withColumn("pid", spark_partition_id())
      .materialized()
    val offsets = parts.groupBy($"pid").agg(count(lit(1)).as("pn"))
      // one row per partition: a single-partition window here is fine
      .withColumn("off",
        coalesce(sum($"pn").over(
          Window.orderBy($"pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"pid", $"off")
    val inPart = Window.partitionBy($"pid").orderBy($"h", $"doc_id")
    parts.join(broadcast(offsets), "pid")
      .withColumn("pos", row_number().over(inPart).cast("long") - 1 + $"off")
      .select($"doc_id", $"pos",
        expr(s"pos DIV $docsPerShard").as("shard"))
  }

  /** Sentence-boundary chunking: split each document into sentences and
    * greedily pack CONSECUTIVE sentences into chunks of ~`maxTokens`
    * whitespace tokens — the long-document treatment when mid-sentence
    * cuts (q127's fixed windows) would hurt training text. A sentence
    * belongs to chunk `floor(exclusive-token-prefix / maxTokens)`, so
    * chunks hold whole sentences, only the sentence that CROSSES a
    * boundary overflows its chunk, and a single over-budget sentence
    * skips chunk ids rather than being split.
    *
    * Sentence boundaries are `[.!?]` followed by whitespace — detected
    * by marker substitution (`$1\u0001` + split), NOT lookbehind, so the
    * regex is portable to RE2-based engines (DuckDB oracle); whitespace
    * is the explicit `[ \t\n\x0B\f\r]` class (`\s` itself diverges
    * between Java regex and RE2 on U+000B).
    *
    * Entirely MAP-SIDE: sentence split, HOF running sum (no window, no
    * shuffle), chunk fan-out by exploding the doc's distinct chunk ids.
    * Output: (doc_id, chunk_id, n_sentences, n_tokens, chunk_text). */
  def chunkSentences(docs: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val ws = "[ \\t\\n\\x0B\\f\\r]+"
    val sents = filter(
      split(regexp_replace(col(textCol), "([.!?])" + ws, "$1\u0001"),
        "\u0001"),
      x => trim(x) =!= "")
    val cnts = transform(col("ss"), x =>
      size(filter(split(x, ws), w => w =!= "")).cast("long"))
    // exclusive running token prefix per sentence, as a pure HOF fold
    val prefixes = aggregate(col("cc"),
      struct(expr("CAST(array() AS array<bigint>)").as("arr"),
        lit(0L).as("s")),
      (acc, x) => struct(
        concat(acc.getField("arr"), array(acc.getField("s"))).as("arr"),
        (acc.getField("s") + x).as("s")),
      acc => acc.getField("arr"))
    val chunkOf = (p: Column) =>
      floor(p.cast("double") / lit(maxTokens.toDouble)).cast("long")
    Par.ensure(docs)
      .select(col(idCol).as("doc_id"), sents.as("ss"))
      .filter(size($"ss") > 0)
      .withColumn("cc", cnts)
      .withColumn("pp", prefixes)
      // (chunk, sentence) and (chunk, n_tokens) pairs
      .withColumn("zs", zip_with($"ss", $"pp",
        (s, p) => struct(chunkOf(p).as("c"), s.as("sent"))))
      .withColumn("zn", zip_with($"cc", $"pp",
        (n, p) => struct(chunkOf(p).as("c"), n.as("n"))))
      .select($"doc_id", $"zs", $"zn",
        explode(array_distinct(transform($"zs", z => z.getField("c"))))
          .as("chunk_id"))
      .select($"doc_id", $"chunk_id",
        size(filter($"zs", z => z.getField("c") === $"chunk_id"))
          .cast("long").as("n_sentences"),
        aggregate(filter($"zn", z => z.getField("c") === $"chunk_id"),
          lit(0L), (a, z) => a + z.getField("n")).as("n_tokens"),
        array_join(transform(
          filter($"zs", z => z.getField("c") === $"chunk_id"),
          z => z.getField("sent")), " ").as("chunk_text"))
  }

  /** Rebalance a corpus to a TARGET domain mixture (the DoReMi /
    * dataset-mixture step): given target fractions per domain, keep the
    * LARGEST corpus achievable under that mixture without upsampling —
    * N* = min_d(n_d / target_d) — by downsampling each domain to
    * rate_d = target_d · N* / n_d. At least one bottleneck domain keeps
    * rate 1.0; domains absent from `targets` are dropped. Sampling is
    * the deterministic md5-threshold predicate, rates pinned `round(,6)`
    * for cross-engine reproducibility.
    *
    * Scale shape: one dictionary-sized count agg (k = #domains rows),
    * the unpartitioned min-window runs over THAT table only, and the
    * rate table broadcast-joins back — the corpus itself never shuffles.
    * Output: input columns filtered to the sampled rows. */
  def mixtureBalance(docs: DataFrame, idCol: String, domainCol: String,
                     targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0.0), "target fractions must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = Par.ensure(docs)
    val tgt = targets.toSeq.toDF("__g", "__target")
    val cnt = d.groupBy(col(domainCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
      .join(tgt, Seq("__g"))
    // N* over the k-row domain table: unpartitioned window is fine HERE
    val nstar = min($"__n".cast("double") / $"__target")
      .over(Window.partitionBy())
    val rates = cnt.select($"__g",
      round(least(lit(1.0), $"__target" * nstar / $"__n".cast("double")),
        6).as("__rate"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val r = broadcast(rates)
    d.join(r, d(domainCol) <=> r("__g"))
      .filter(bucket < round(r("__rate") * lit(4294967296.0)))
      .select(d.columns.map(d(_)): _*)
  }

  /** The UPSAMPLING counterpart of [[mixtureBalance]]: hit the target
    * mixture by REPLICATING under-represented domains (training epochs)
    * instead of shrinking over-represented ones. Sized so the most
    * over-target domain keeps exactly one epoch — N* = max_d(n_d /
    * target_d), rate_d = target_d · N* / n_d >= 1 — each document emits
    * `floor(rate)` epoch rows plus one more iff its md5 bucket falls
    * under the fractional remainder (deterministic per doc, rates pinned
    * `round(,6)`). Domains absent from `targets` are dropped.
    *
    * Scale shape: the same dictionary-sized count agg + broadcast rate
    * join as [[mixtureBalance]]; the epoch fan-out is a map-side
    * `explode(sequence(...))`, so the corpus never shuffles — output
    * volume is the upsampled corpus itself, which is the point.
    * Output: (idCol, domainCol, epoch in 0..k-1). */
  def mixtureEpochs(docs: DataFrame, idCol: String, domainCol: String,
                    targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0.0), "target fractions must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = Par.ensure(docs)
    val tgt = targets.toSeq.toDF("__g", "__target")
    val cnt = d.groupBy(col(domainCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
      .join(tgt, Seq("__g"))
    val nstar = max($"__n".cast("double") / $"__target")
      .over(Window.partitionBy())
    val rates = cnt.select($"__g",
      round($"__target" * nstar / $"__n".cast("double"), 6).as("__rate"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val r = broadcast(rates)
    d.join(r, d(domainCol) <=> r("__g"))
      .withColumn("__k",
        floor($"__rate").cast("long") +
          when(bucket <
            round(($"__rate" - floor($"__rate")) * lit(4294967296.0)), 1L)
            .otherwise(0L))
      .select(d(idCol), d(domainCol),
        explode(sequence(lit(0L), $"__k" - 1)).as("epoch"))
  }

  /** Resharding-movement audit: the fraction of keys that RELOCATE
    * when the shard count grows nFrom -> nTo, under (a) naive modulo
    * placement and (b) rendezvous (highest-random-weight) hashing.
    * Modulo reshuffles almost everything (~1 - 1/nTo of keys change
    * `h % n`); rendezvous moves only the keys the NEW shards win
    * (~(nTo-nFrom)/nTo) — the reason stateful layouts (corpus shards,
    * caches, ANN partitions) reshard with HRW, and this audit is the
    * receipt a migration plan attaches. Deterministic h60 scoring
    * replays in any engine.
    *
    * Shape: one distinct-key pass, a nTo-way fan (shard dictionary)
    * with one hash per (key, shard), both placements as min_by hash
    * aggregates per key (no windows), then ONE 1-row rollup. Output:
    * 1 row (n_keys, moved_mod, moved_hrw, frac_mod, frac_hrw). */
  def reshardMovement(df: DataFrame, keyCol: String, nFrom: Int,
                      nTo: Int): DataFrame = {
    require(nFrom >= 1 && nTo > nFrom, "need 1 <= nFrom < nTo")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = Par.ensure(df)
      .select(col(keyCol).cast("string").as("kk"))
      .filter($"kk".isNotNull).distinct()
    val sc = keys
      .select($"kk", explode(sequence(lit(0), lit(nTo - 1))).as("s"))
      .withColumn("score",
        Sketches.h60(concat($"kk", lit("|"), $"s".cast("string"))))
    // HRW placement at both sizes from ONE score table: the nFrom
    // argmax demotes s >= nFrom below every real score instead of
    // re-hashing a second fan
    val a = sc.groupBy($"kk").agg(
      min_by($"s", struct(
        when($"s" < nFrom, -$"score").otherwise(lit(Long.MaxValue))
          .as("o"), $"s")).as("hrw_from"),
      min_by($"s", struct((-$"score").as("o"), $"s")).as("hrw_to"))
    val hk = Sketches.h60($"kk")
    val moved = a.select(
      (hk % nFrom =!= hk % nTo).as("mod_moved"),
      ($"hrw_from" =!= $"hrw_to").as("hrw_moved"))
    val tot = moved.agg(
      count(lit(1)).cast("long").as("n_keys"),
      sum(when($"mod_moved", 1L).otherwise(0L)).cast("long")
        .as("moved_mod"),
      sum(when($"hrw_moved", 1L).otherwise(0L)).cast("long")
        .as("moved_hrw"))
    tot.select($"n_keys", $"moved_mod", $"moved_hrw",
      (round(Par.safeDiv($"moved_mod".cast("double"),
        $"n_keys".cast("double")) * 1e6) / 1e6).as("frac_mod"),
      (round(Par.safeDiv($"moved_hrw".cast("double"),
        $"n_keys".cast("double")) * 1e6) / 1e6).as("frac_hrw"))
  }

  /** Consistent per-key sample: for each key, the k rows with the
    * smallest (32-bit md5-prefix hash of id, id) — the deterministic
    * "show me a few examples from every slice" primitive behind eyeball
    * QA, golden-set refreshes, and debug dashboards. CONSISTENT means
    * re-runs (and both engines) pick the identical rows, and a row's
    * membership never depends on what else arrived — unlike LIMIT,
    * which is partition-order roulette.
    *
    * The 32-bit prefix (not [[Sketches.h60]]) is deliberate: it is
    * exact in an IEEE double, so the bounded TopKBy aggregate's
    * (double score, id) ordering is bit-identical to a SQL
    * `ORDER BY hash, id` — ties at equal hash break by id.
    *
    * Scale shape: one bounded TopKBy per key — k rows of state per
    * partition per key, map-side partials, NO window over raw volume
    * and no global sort. Output: (key, id, hash32) exploded, ordered
    * within key by (hash32, id). */
  def consistentSample(df: DataFrame, keyCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    // the bounded TopKBy aggregate carries the id as an int64 payload, so
    // the id column must be integral — fail loudly here rather than let
    // the cast below silently null out string/decimal ids in the output
    require(graft.functions.TopKBy.isIntegralId(df.schema(idCol).dataType),
      s"consistentSample requires an integral id column; " +
      s"'$idCol' is ${df.schema(idCol).dataType.simpleString}")
    val spark = df.sparkSession
    import spark.implicits._
    val h32 = conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long")
    Par.ensure(df)
      .select(col(keyCol).as("key"), col(idCol).cast("long").as("id"),
        h32.as("h"))
      .groupBy($"key")
      .agg(graft.functions.TopKBy.topKMin($"h".cast("double"), $"id", k)
        .as("top"))
      .select($"key", explode($"top").as("e"))
      .select($"key", $"e.id".as("id"), $"e.score".cast("long").as("hash32"))
  }
}
