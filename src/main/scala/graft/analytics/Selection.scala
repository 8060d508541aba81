package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators for training-corpus curation: DSIR-style
  * importance weighting and target-mix rebalancing. Both deterministic
  * (md5 hashing, round(,6) on emitted doubles, integer counts) so DuckDB
  * oracles reproduce them bit-for-bit. (Extension surface per SURVEY.md
  * §7 step 5 — the reference's own selection stops at row filters,
  * main.py:87-95.)
  */
object Selection {

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the log-likelihood ratio of a TARGET hashed-unigram model over the
    * RAW-corpus model — the standard recipe for up-weighting data that
    * looks like a curated target slice. Features are the same
    * `md5[0:8] mod dim` buckets as [[TfIdf.hashingTf]] (vocabulary-free,
    * engine-portable); both models use add-one smoothing over `dim`
    * buckets.
    *
    * Scale shape: ONE tokenization pass feeds both the model aggregation
    * and the scoring join (localCheckpoint reuse, same rule as
    * [[TextAnalysis.surprisalGate]]); the model is a `dim`-row table
    * crossed with a 1-row totals aggregate (the allowlisted
    * scalar-broadcast pattern) and broadcast back, so scoring is
    * map-side over the pre-aggregated (id, bucket) counts. Nothing in the
    * plan scales with anything but the corpus scan and one
    * (id, bucket)-keyed exchange.
    *
    * Per-bucket log-weights are rounded to 6 before the per-doc sum (the
    * internalized-model rule, as [[Similarity.centroidClassify]]) so both
    * engines sum identical terms. Documents with no tokens emit a null
    * weight (fail-closed for selection).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, dim: Int = 64): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = Par.ensure(docs)
    // (id, tgt, bucket) -> tf: the shared subtree (checkpointed — it feeds
    // the model aggregate AND the scoring join)
    val db = d.select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(Dedup.tokens(col(textCol))).as("w"))
      .withColumn("bucket",
        (conv(substring(md5($"w"), 1, 8), 16, 10).cast("long") % dim)
          .cast("int"))
      .groupBy($"id", $"tgt", $"bucket")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val model = db.groupBy($"bucket")
      .agg(sum($"tf").as("raw_n"),
        sum(when($"tgt", $"tf").otherwise(lit(0L))).as("tgt_n"))
    val tot = model.agg(sum($"raw_n").as("raw_t"), sum($"tgt_n").as("tgt_t"))
    val logw = model.crossJoin(broadcast(tot))
      .select($"bucket",
        round(
          log(($"tgt_n" + 1).cast("double") /
            ($"tgt_t" + dim).cast("double")) -
          log(($"raw_n" + 1).cast("double") /
            ($"raw_t" + dim).cast("double")), 6).as("logw"))
    val scored = db.join(broadcast(logw), Seq("bucket"))
      .groupBy($"id")
      .agg(round(sum($"tf".cast("double") * $"logw"), 6).as("dsir_weight"))
    d.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select($"id", $"dsir_weight")
  }

  /** The DSIR SELECTION step: keep the top `topFrac` of the corpus by
    * importance weight — threshold = the corpus `(1-topFrac)` exact
    * percentile of [[dsirWeights]], ONE row broadcast back (the
    * [[TextAnalysis.surprisalGate]] bracket), so selection is map-side
    * over the scored corpus. Docs with null weight (no tokens) fail
    * closed. Output: (id, dsir_weight, keep). */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, topFrac: Double = 0.25,
                 dim: Int = 64): DataFrame = {
    require(topFrac > 0.0 && topFrac < 1.0, "topFrac must be in (0, 1)")
    val spark = docs.sparkSession
    import spark.implicits._
    // checkpoint: weights feed the threshold aggregate AND the output
    val w = dsirWeights(docs, idCol, textCol, isTarget, dim)
      .localCheckpoint()
    val thr = w.filter($"dsir_weight".isNotNull)
      .agg(round(expr(s"percentile(dsir_weight, ${1.0 - topFrac})"), 6)
        .as("thr"))
    w.crossJoin(broadcast(thr))
      .select($"id", $"dsir_weight",
        coalesce($"dsir_weight" >= $"thr", lit(false)).as("keep"))
  }

  /** Rebalance a corpus toward TARGET mix proportions: given per-stratum
    * target shares (summing to ~1) and a document budget, derive keep
    * rates `rate_s = min(1, budget * share_s / n_s)` from the observed
    * stratum counts and apply [[Sampling.stratifiedSample]]'s
    * deterministic md5-threshold filter — the C4/RefinedWeb-style source
    * re-weighting step. Strata absent from `shares` get share 0 (dropped).
    *
    * Scale shape: the counts aggregate is dictionary-sized (one row per
    * stratum) and collected to the driver — the model-exchange pattern,
    * bounded by stratum cardinality, never the corpus — then the filter is
    * a plan-time literal CASE, entirely map-side. Output keeps the rate
    * column (rounded 6) for lineage.
    */
  def mixCorpus(docs: DataFrame, idCol: String, stratumCol: String,
                shares: Map[String, Double], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shares.values.forall(s => s >= 0.0 && s <= 1.0),
      "shares must be in [0, 1]")
    val counts = docs.groupBy(col(stratumCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates: Map[String, Double] = counts.map { case (s, n) =>
      s -> math.min(1.0, budget * shares.getOrElse(s, 0.0) / n)
    }
    val rateCol = rates.foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (s, r)) => acc.when(col(stratumCol) === s, lit(r))
    }.otherwise(lit(0.0))
    Sampling.stratifiedSample(
        docs.filter(col(stratumCol).isNotNull), idCol, stratumCol,
        rates.map { case (s, r) => s -> r })
      .withColumn("rate", round(rateCol, 6))
  }

  /** fastText/DCLM-style quality classifier: full-batch logistic
    * regression over hashed-unigram features, trained ON the corpus
    * against a caller-supplied binary `label` (e.g. "looks like the
    * curated slice") and then scoring every document — the modern
    * learned data-selection filter (DCLM's fastText gate, GPT-3's
    * LR-over-features quality filter; one model order up from
    * [[dsirWeights]]'s likelihood ratio).
    *
    * Model: features are the [[TfIdf.hashingTf]] `md5[0:8] mod dim`
    * buckets with doc-length-normalized tf (`tf / n_tokens`) plus a
    * constant bias feature at index `dim`; `iters` full-batch gradient
    * steps `w ← w − lr · round(Σ_i (σ(w·x_i) − y_i) x_i / n, 6)` from
    * w = 0. Everything an oracle needs is pinned: fixed iteration count,
    * zero init, and the ROUND-6 GRADIENT exchange — the same fixed-point
    * trick as [[Cluster]]'s centroid exchange — so both engines step
    * through bit-identical models even though their sum orders differ.
    * Output: (id, y, score σ(w·x) rounded 6, keep = score ≥ 0.5).
    * Docs with no tokens ride the bias feature alone.
    *
    * Scale shape — canonical distributed full-batch GD: the feature
    * table is built ONCE (one tokenization, one (id, bucket) partial-agg
    * exchange, doc length via an id-partitioned window), repartitioned by
    * id and checkpointed; each iteration is one margin aggregation and
    * one id-keyed join + bucket aggregation over that materialized table
    * — both pre-partitioned on id, so iterations add NO new corpus
    * exchanges — ending in a (dim+1)-row round-6 collect (the
    * model-sized exchange, independent of corpus size). At 100 TB:
    * iters × (2 scans of the persisted features + tiny collect).
    */
  def logregQuality(docs0: DataFrame, idCol: String, textCol: String,
                    label: Column, dim: Int = 64, iters: Int = 10,
                    lr: Double = 0.5): DataFrame = {
    require(dim >= 1 && iters >= 1, "dim and iters must be >= 1")
    require(lr > 0.0, "lr must be positive")
    val spark = docs0.sparkSession
    import spark.implicits._
    val docs = Par.ensure(docs0)

    val toks = docs.select(col(idCol).as("id"),
        label.cast("int").as("y"),
        explode(Dedup.tokens(col(textCol))).as("w"))
      .withColumn("bucket",
        (conv(substring(md5($"w"), 1, 8), 16, 10).cast("long") % dim)
          .cast("int"))
      .groupBy($"id", $"y", $"bucket").agg(count(lit(1)).as("tf"))
      .withColumn("nt", sum($"tf").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"id")))
    val feats = toks
      .select($"id", $"y", $"bucket",
        ($"tf".cast("double") / $"nt".cast("double")).as("x"))
      .unionByName(docs.select(col(idCol).as("id"),
        label.cast("int").as("y"), lit(dim).cast("int").as("bucket"),
        lit(1.0).as("x")))
      .repartition($"id")
      .localCheckpoint()
    val n = docs.count().toDouble

    var w = Array.fill(dim + 1)(0.0)
    def margins(wv: Array[Double]): DataFrame = {
      val wArr = array(wv.map(lit(_)): _*)
      feats.groupBy($"id", $"y")
        .agg(sum(element_at(wArr, $"bucket" + 1) * $"x").as("mg"))
    }
    for (_ <- 1 to iters) {
      val g = margins(w)
        .select($"id",
          (lit(1.0) / (lit(1.0) + exp(-$"mg")) - $"y".cast("double"))
            .as("r"))
        .join(feats.select($"id", $"bucket", $"x"), Seq("id"))
        .groupBy($"bucket")
        .agg(round(sum($"r" * $"x") / lit(n), 6).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wb, b) =>
        wb - lr * g.getOrElse(b, 0.0)
      }
    }
    margins(w).select($"id", $"y",
        round(lit(1.0) / (lit(1.0) + exp(-$"mg")), 6).as("score"))
      .withColumn("keep", $"score" >= 0.5)
  }
}
