package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic k-means corpus clustering (Lloyd's algorithm, fixed
  * iteration count) — the organization step of SemDeDup-class curation
  * pipelines: cluster the embedding corpus, then curate within clusters
  * (near-dup removal, per-cluster sampling, diversity balancing).
  *
  * Everything a SQL oracle needs to reproduce the result exactly is pinned:
  *  - init: the k corpus vectors with the smallest `(md5(id), id)` (the
  *    [[Pq.codebookRows]] sample);
  *  - a FIXED number of Lloyd iterations (no convergence test — a float
  *    epsilon test would itself be engine-sensitive);
  *  - fixed-point model exchange: updated centroids are rounded to 6
  *    decimals before the next assignment, so both engines assign against
  *    bit-identical models even though their mean-reduction orders differ;
  *  - argmin ties break to the lower centroid id (strict `<`).
  *
  * Scale shape — the canonical distributed k-means:
  *  - assignment is the [[graft.functions.PqKernels]] argmin kernel with
  *    m = 1 (full-vector subspace): one map-side projection against the
  *    broadcast centroid model, no shuffle;
  *  - the update step shuffles only (cluster, dim-position, partial sums)
  *    via partial-aggregated avg — k×dim rows reach the driver (the
  *    model-sized collect, independent of corpus size);
  *  - per iteration: one assignment projection + one bounded aggregation.
  *    At 100 TB with persistent input this is iters × (scan + tiny agg).
  */
object Cluster {

  /** Assign every vector to a cluster after `iters` Lloyd iterations.
    * Output: (vec_id, cluster, dist2) — final squared distance to the
    * winning centroid, rounded to 6 decimals. Empty clusters keep their
    * previous centroid (rule pinned for the oracle; at k ≪ n it never
    * fires). */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, iters: Int = 2): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val (v, dim) = Pq.vectors(Par.ensure(emb), idCol, vecCol)
    var cents: Seq[Seq[Double]] = Pq.codebookRows(v, k)
    require(cents.size == k, s"corpus has fewer than $k vectors")

    def assigned(cb: Seq[Seq[Double]]): DataFrame = {
      val enc = graft.functions.PqKernels.pqEncode(col("v"), cb, m = 1)
      v.select(col("vid"), col("v"),
        element_at(enc.getField("codes"), 1).as("cluster"),
        enc.getField("qerr").as("d2"))
    }

    for (_ <- 1 until iters) {
      // element-wise mean per cluster: (cluster, pos)-keyed partial-agg
      // shuffle; k×dim rows to the driver. Means round to 6 decimals —
      // the fixed-point model both engines agree on bit-for-bit.
      // round(,6) INSIDE the query: Spark's round and DuckDB's round are
      // both half-away-from-zero, so the exchanged model is the engines'
      // common fixed point (a driver-side math.rint would be half-EVEN)
      val means = assigned(cents)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(round(avg(col("x")), 6).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(rows =>
          rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        .toMap
      cents = cents.zipWithIndex.map { case (old, c) =>
        means.getOrElse(c, old)
      }
    }

    assigned(cents).select(
      col("vid").as("vec_id"),
      col("cluster").cast("int").as("cluster"),
      round(col("d2"), 6).as("dist2"))
  }
}
