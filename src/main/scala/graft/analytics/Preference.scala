package graft.analytics

import Par.Mat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pairwise-preference aggregation — the RLHF / eval-pipeline shape:
  * a feed of (winner, loser) comparisons (human preferences, A/B
  * judgments, model-vs-model matches) folds into one strength score
  * per item, so "which responses do raters prefer" becomes a ranking
  * with a principled model behind it rather than a raw win-rate (which
  * ignores WHO you beat).
  */
object Preference {

  /** Bradley-Terry strength scores via `iters` rounds of Hunter's MM
    * update (Hunter 2004): with `n_ij` the number of comparisons
    * between i and j and `W_i` i's total wins,
    * `theta'_i = W_i / sum_j n_ij / (theta_i + theta_j)`, normalized
    * to geometric mean 1 each round. Regularization: every node gets
    * ONE virtual win and ONE virtual loss against a phantom opponent
    * of fixed strength 1 (numerator `W_i + 1`, denominator gains
    * `2 / (theta_i + 1)`) — zero-win nodes stay finite and the
    * phantom's pull vanishes as real comparisons accumulate, the
    * standard shrinkage.
    *
    * Scale shape: the match table is node-keyed `(i, j, n_ij)`
    * (symmetrized, persisted); each round is two node-keyed joins of
    * the theta table against it + one aggregate + a geometric-mean
    * normalize — the pageRank round shape, and like pageRank the
    * fixed-iteration recurrence with interpolated constants lets a SQL
    * oracle replay it exactly. The round's RAW scores are
    * `Par.materialize`d and the normalizer collects as ONE driver
    * scalar over the checkpointed blocks (pageRank's N precedent):
    * normalizing through a broadcast subtree instead made every round's
    * materialization evaluate the join+aggregate pipeline TWICE — once
    * for the scores, once inside the broadcast — a measured ~25% of
    * q199's round cost. Theta itself stays a lazy projection over the
    * round's blocks, so lineage is one round deep either way.
    * Self-comparisons are dropped. Deterministic to the rounded places:
    * float addition order perturbs ulps the final round-6 absorbs.
    *
    * Output: (node, n_games, wins, score) — score rounded 6 via the
    * scaled-integer pattern, geometric mean ~1, higher = stronger. */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int = 10): DataFrame = {
    require(iters >= 1, "need iters >= 1")
    val spark = comparisons.sparkSession
    import spark.implicits._
    val games = comparisons
      .select(col(winnerCol).as("w"), col(loserCol).as("l"))
      .filter($"w" =!= $"l")
    val m = games.select($"w".as("i"), $"l".as("j"))
      .union(games.select($"l".as("i"), $"w".as("j")))
      .groupBy($"i", $"j").agg(count(lit(1)).cast("long").as("nij"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val winCounts = games.groupBy($"w".as("node"))
      .agg(count(lit(1)).cast("long").as("wins"))
    val base = m.groupBy($"i".as("node"))
      .agg(sum($"nij").cast("long").as("n_games"))
      .join(winCounts, Seq("node"), "left")
      .select($"node", $"n_games", coalesce($"wins", lit(0L)).as("wins"))
      .materialized()
    var th = base.select($"node", lit(1.0).as("th"))
    for (_ <- 1 to iters) {
      val d = m
        .join(th.select($"node".as("i"), $"th".as("ti")), Seq("i"))
        .join(th.select($"node".as("j"), $"th".as("tj")), Seq("j"))
        .groupBy($"i".as("node"), $"ti")
        .agg(sum($"nij".cast("double") / ($"ti" + $"tj")).as("dsum"))
      val raw = base.join(d, Seq("node"))
        .select($"node", (($"wins" + 1).cast("double") /
          ($"dsum" + lit(2.0) / ($"ti" + lit(1.0)))).as("score"))
        .materialized()
      // the normalizer is ONE scalar over the round's checkpointed
      // blocks; same double either as a literal or a broadcast column,
      // but the broadcast form re-evaluated the whole round pipeline a
      // second time inside the materialization
      val gRow = raw.agg(exp(avg(log($"score"))).as("g")).head()
      val g = if (gRow.isNullAt(0)) 1.0 else gRow.getDouble(0)
      th = raw.select($"node", ($"score" / lit(g)).as("th"))
    }
    val projected = base.join(th, Seq("node"))
      .select($"node", $"n_games", $"wins",
        (round($"th" * 1e6) / 1e6).as("score"))
    val out = projected.materialized()
    m.unpersist()
    out
  }
}
