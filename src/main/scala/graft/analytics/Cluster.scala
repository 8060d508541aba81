package graft.analytics

import Par.Mat

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The shared Lloyd core: the assignment table (vid, v, cluster, d2)
    * after `iters` iterations, plus the trained model (k centroids in
    * cluster order). Empty clusters keep their previous centroid (rule
    * pinned for the oracle; at k ≪ n it never fires). */
  private def lloyd(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int): (DataFrame, Seq[Seq[Double]]) = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val (v, _) = Pq.vectors(Par.ensure(emb), idCol, vecCol)

    def assigned(cb: Seq[Seq[Double]]): DataFrame = {
      val enc = graft.functions.PqKernels.pqEncode(col("v"), cb, m = 1)
      v.select(col("vid"), col("v"),
        element_at(enc.getField("codes"), 1).as("cluster"),
        enc.getField("qerr").as("d2"))
    }

    // the trained model is k x dim driver doubles derived
    // deterministically from (emb, k, iters) — memoize it (ValueMemo)
    // so the six clustering-family gates that organize the SAME corpus
    // with the SAME hyperparams train Lloyd once per session; each
    // gate's map-side assignment still runs on its own plan
    val cents = centroidMemo.getOrCompute(
      Seq(emb.select(col(idCol), col(vecCol))), s"k=$k,iters=$iters") {
      var cb: Seq[Seq[Double]] = Pq.codebookRows(v, k)
      require(cb.size == k, s"corpus has fewer than $k vectors")
      for (_ <- 1 until iters) {
        // element-wise mean per cluster: (cluster, pos)-keyed partial-agg
        // shuffle; k×dim rows to the driver. round(,6) INSIDE the query:
        // Spark's round and DuckDB's round are both half-away-from-zero,
        // so the exchanged model is the engines' common fixed point (a
        // driver-side math.rint would be half-EVEN).
        val means = assigned(cb)
          .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos").agg(round(avg(col("x")), 6).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .view.mapValues(rows =>
            rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          .toMap
        cb = cb.zipWithIndex.map { case (old, c) =>
          means.getOrElse(c, old)
        }
      }
      cb
    }
    require(cents.size == k, s"corpus has fewer than $k vectors")
    (assigned(cents), cents)
  }

  private[graft] val centroidMemo =
    new ValueMemo[Seq[Seq[Double]]]("kmeans_centroids")

  /** Assign every vector to a cluster after `iters` Lloyd iterations.
    * Output: (vec_id, cluster, dist2) — final squared distance to the
    * winning centroid, rounded to 6 decimals. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, iters: Int = 2): DataFrame =
    lloyd(emb, idCol, vecCol, k, iters)._1.select(
      col("vid").as("vec_id"),
      col("cluster").cast("int").as("cluster"),
      round(col("d2"), 6).as("dist2"))

  /** Cluster-stratified coreset: the `m` vectors CLOSEST to their
    * centroid from every k-means cluster — the prototype subset a
    * diversity-balanced data-selection pass keeps (every region of
    * embedding space contributes its most-central exemplars, instead of
    * a global top-m collapsing onto the densest cluster).
    *
    * Scale shape: selection per cluster is the bounded native
    * [[graft.functions.TopKBy]] aggregate — k pairs of state per
    * partial, map-side combined — so a 10^8-member cluster never sorts
    * through one task the way the `row_number` window form (which the
    * DuckDB oracle runs) would. Ties break by id; dist2 is the round-6
    * assignment distance, so ranks are reproducible cross-engine.
    *
    * Output: (cluster, rank 1..m, vec_id, dist2) — rank ascending by
    * (dist2, vec_id) within each cluster. */
  def clusterCoreset(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int = 8, iters: Int = 2, m: Int = 25): DataFrame = {
    require(m >= 1, "m must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val assigned = kmeansAssign(emb, idCol, vecCol, k, iters)
    val idType = assigned.schema("vec_id").dataType
    if (graft.functions.TopKBy.isIntegralId(idType))
      assigned.groupBy($"cluster")
        .agg(graft.functions.TopKBy.topKMin($"dist2", $"vec_id", m)
          .as("top"))
        .select($"cluster", posexplode($"top"))
        .select($"cluster", ($"pos" + 1).cast("int").as("rank"),
          // TopKBy state widens to bigint; restore the caller's id type
          $"col.id".cast(idType).as("vec_id"), $"col.score".as("dist2"))
    else {
      // non-integral ids: the equivalent window form (what the oracle
      // runs) instead of failing TopKBy's integral-state check
      import org.apache.spark.sql.expressions.Window
      assigned.withColumn("rank", row_number().over(
          Window.partitionBy($"cluster").orderBy($"dist2", $"vec_id")))
        .filter($"rank" <= m)
        .select($"cluster", $"rank".cast("int").as("rank"),
          $"vec_id", $"dist2")
    }
  }

  /** Simplified (centroid-based) silhouette per cluster: for each
    * vector, `a` = distance² to its OWN centroid, `b` = min distance²
    * to any OTHER centroid, `s = (b - a) / max(a, b)` — the clustering-
    * quality audit that says whether the k-means organization the
    * SemDeDup/coreset/IVF pipelines stand on actually separated
    * anything (mean s near 0 = clusters overlap; near 1 = tight and
    * far apart). The centroid form is THE silhouette that scales: the
    * textbook pairwise-distance form is Σ n_c² work for a number the
    * centroid approximation tracks, so this is one map-side pass
    * against the broadcast k x dim literal model — no joins at all
    * after assignment.
    *
    * Determinism: all k distances recompute through one left-to-right
    * fold (matching SQL list_distance evaluation), round to 6 BEFORE
    * the compare so both engines pick b from identical values; the
    * degenerate max(a, b) = 0 point (vector ON two coincident
    * centroids) scores 0 by the sklearn convention. Per-cluster means
    * sum as scaled integers. Output: (cluster, n, mean_silhouette,
    * min_silhouette), ordered by the caller. */
  def simplifiedSilhouette(emb: DataFrame, idCol: String, vecCol: String,
                           k: Int = 8, iters: Int = 2): DataFrame = {
    require(k >= 2, "silhouette needs k >= 2 (no 'other' centroid at 1)")
    val spark = emb.sparkSession
    import spark.implicits._
    val (asg, cents) = lloyd(emb, idCol, vecCol, k, iters)
    val cb = typedLit(cents.map(_.toArray).toArray)
    val d2 = (cv: Column) => round(aggregate(
      zip_with($"v", cv, (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, e) => acc + e), 6)
    val dists = transform(cb, cv => d2(cv))
    val scored = asg
      .withColumn("a2", element_at(dists, ($"cluster" + 1).cast("int")))
      .withColumn("b2", array_min(transform(filter(
        zip_with(dists, sequence(lit(0), lit(k - 1)),
          (d, i) => struct(d.as("d"), i.as("i"))),
        s => s.getField("i") =!= $"cluster"),
        s => s.getField("d"))))
    scored
      .withColumn("s", when(greatest($"a2", $"b2") > 0.0,
        ($"b2" - $"a2") / greatest($"a2", $"b2")).otherwise(lit(0.0)))
      .groupBy($"cluster".cast("int").as("cluster"))
      .agg(count(lit(1)).cast("long").as("n"),
        (round(sum(round($"s" * 1e9).cast("long")) / 1e9 /
          count(lit(1)).cast("double") * 1e6) / 1e6)
          .as("mean_silhouette"),
        (round(min(round($"s" * 1e9).cast("long")) / 1e9 * 1e6) / 1e6)
          .as("min_silhouette"))
  }

  /** SemDeDup: semantic near-duplicate pruning scoped to k-means
    * clusters — the composition the SemDeDup pipeline ships (cluster the
    * corpus, then drop all-but-one of every within-cluster near-dup
    * group). A vector is dropped when a SMALLER-id vector in its cluster
    * has cosine ≥ `minCosine` (deterministic keep-lowest-id rule).
    *
    * Scale shape: the pair stage is a cluster-keyed self-join — work is
    * Σ n_c², bounded by running with k ∝ corpus size (exactly why
    * SemDeDup clusters first instead of an all-pairs scan); `maxCluster`
    * drops degenerate clusters from pairing (their members all keep —
    * conservative), mirroring the LSH bucket caps. The assignment table
    * is checkpointed once and feeds the cap probe, both join sides, and
    * the final flag join. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               minCosine: Double, k: Int = 8, iters: Int = 2,
               maxCluster: Int = 1000): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val aa = lloyd(emb, idCol, vecCol, k, iters)._1
      .select($"vid", $"v", $"cluster").materialized()
    val big = aa.groupBy($"cluster").agg(count(lit(1)).as("n"))
      .filter($"n" > maxCluster).select($"cluster")
    val sm = aa.join(broadcast(big), Seq("cluster"), "left_anti")
    val a = sm.select($"cluster", $"vid".as("vid_a"), $"v".as("va"))
    val b = sm.select($"cluster", $"vid".as("vid_b"), $"v".as("vb"))
    val dups = a.join(b, Seq("cluster")).filter($"vid_a" < $"vid_b")
      .filter(round(Similarity.cosine($"va", $"vb"), 6) >= minCosine)
      .select($"vid_b".as("vid")).distinct()
    aa.join(dups.withColumn("dup", lit(1)), Seq("vid"), "left")
      .select($"vid".as("vec_id"),
        $"cluster".cast("int").as("cluster"),
        $"dup".isNull.as("keep"))
  }

  /** Train the IVF index ONCE: `iters` Lloyd iterations over the corpus,
    * returned as a parquet-writable model table
    * `(cluster INT, centroid ARRAY<DOUBLE>)` — the persisted artifact a
    * production ANN deployment probes for weeks. At 100 TB training runs
    * as a scheduled job; per-query-batch retraining (what the one-shot
    * [[kmeansIvfTopK]] composition does, and what the reference's
    * cosine-matrix service does per REQUEST — assets/Visualization Cosine
    * Similarity Matrix/main.py:40-60) re-pays iters full-corpus scans on
    * every call. `train` → parquet → [[ivfTopK]] amortizes them to zero. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            k: Int = 8, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    lloyd(emb, idCol, vecCol, k, iters)._2
      .zipWithIndex.map { case (cv, c) => (c, cv) }
      .toDF("cluster", "centroid")
  }

  /** The stored model back as the kernel's centroid rows: k×dim doubles,
    * cluster-ordered — the bounded model-sized collect (never corpus
    * data). Validates the contiguous-id contract a written-then-reread
    * model must keep. */
  private[analytics] def modelCentroids(model: DataFrame): Seq[Seq[Double]] = {
    val rows = model.select(
        col("cluster").cast("int"),
        col("centroid").cast("array<double>"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toSeq
    require(rows.nonEmpty, "model has no centroids")
    require(rows.map(_._1) == rows.indices.toSeq,
      s"model clusters must be contiguous 0..k-1, got ${rows.map(_._1)}")
    val cents = rows.map(_._2)
    require(cents.forall(_.length == cents.head.length),
      "model centroids must share one dimension")
    cents
  }

  /** Map-side cluster assignment of `emb` against a trained model:
    * (vid, v, cluster) — one native argmin kernel pass over the broadcast
    * model, no shuffle. Minority wrong-dim vectors are dropped (the
    * [[Pq.vectors]] guard), but a MODEL whose dimension disagrees with
    * the data's majority dimension fails loudly: that's a wrong model
    * file, and silently nulling every row would surface as an empty
    * result instead of the actual mistake. */
  private def assignAgainst(emb: DataFrame, idCol: String, vecCol: String,
                            cents: Seq[Seq[Double]]): DataFrame = {
    val (v, dim) = Pq.vectors(Par.ensure(emb), idCol, vecCol)
    require(cents.head.length == dim,
      s"model dimension ${cents.head.length} != data dimension $dim — " +
        "wrong model for this corpus")
    val enc = graft.functions.PqKernels.pqEncode(col("v"), cents, m = 1)
    v.select(col("vid"), col("v"),
      element_at(enc.getField("codes"), 1).as("cluster"))
  }

  /** IVF top-k PROBE over a trained model — the many-calls side of the
    * train-once/probe-many split ([[graft.analytics.Similarity.ivfTopK]]
    * probes hash-derived centroids; this probes the learned, persisted
    * model). Each query vector's `nprobe` nearest centroids select the
    * inverted lists to scan; exact distances rank the candidates. Tie
    * rules pinned for the oracle: probe order (round-6 centroid
    * distance, cluster id), result order (round-6 distance, neighbor
    * id); a candidate whose id equals the query id is excluded (the
    * self-match rule; id spaces are assumed shared or disjoint, never
    * accidentally colliding).
    *
    * NO training happens here: the model is `modelCentroids`' bounded
    * k×dim collect (parquet-read or straight from [[train]]), and the
    * probe plan contains no Lloyd aggregation — two probe calls against
    * one trained model share all the training work (asserted in PqSpec).
    *
    * Scale shape: the probe is MAP-SIDE over the broadcast k×dim model —
    * one native [[graft.functions.CentroidProbeExpr]] kernel loop per
    * row; the candidate join is keyed on cluster against the
    * checkpointed assignment table; per-query candidates are Σ of
    * nprobe inverted-list sizes, never the corpus. The final rank runs
    * through the bounded [[graft.functions.TopKBy]] aggregate when ids
    * are integral — any of tinyint..bigint, widened losslessly to the
    * aggregate's bigint state and cast back on output (kTop pairs of
    * map-side state — the q201 rule; the candidate table never sorts
    * through a window) — and falls back to the equivalent row_number
    * window for non-integral id types (strings, decimals).
    * Passing the SAME DataFrame reference as `corpus` and `queries`
    * (the q95 every-vector-queries shape) reuses the one checkpointed
    * assignment for both join sides. */
  def ivfTopK(model: DataFrame, corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, kTop: Int = 5,
              nprobe: Int = 2): DataFrame = {
    require(kTop >= 1, "kTop must be >= 1")
    val cents = modelCentroids(model)
    require(nprobe >= 1 && nprobe <= cents.size, "nprobe must be in [1, k]")
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the inverted lists: one assignment pass, checkpointed (it feeds
    // the candidate join and — in self-query mode — the probe side too)
    val aa = assignAgainst(corpus, idCol, vecCol, cents).materialized()
    val qsrc =
      if (queries eq corpus) aa.select($"vid".as("qid"), $"v".as("qv"))
      else {
        val (qv, qdim) = Pq.vectors(Par.ensure(queries), idCol, vecCol)
        require(cents.head.length == qdim,
          s"model dimension ${cents.head.length} != query dimension $qdim")
        qv.select(col("vid").as("qid"), col("v").as("qv"))
      }
    // native probe kernel: one codegen'd loop over the broadcast model
    // per row (the composed struct-array/sort form runs k interpreted
    // HOF distance chains; differential-tested in PqSpec)
    val probes = qsrc.select($"qid", $"qv",
      explode(graft.functions.PqKernels.centroidProbe($"qv", cents, nprobe))
        .as("cluster"))
    val cand = probes.join(aa, Seq("cluster"))
      .filter($"vid" =!= $"qid")
      .select($"qid", $"vid".as("nid"),
        round(Pq.d2($"qv", $"v"), 6).as("nd"))
    // smallest (nd, nid) == the window's ORDER BY nd, nid; nd is a
    // round-6 double so the sort key replays exactly. (qid, nid) rows
    // are unique, so multiplicity semantics cannot differ either.
    val nidType = cand.schema("nid").dataType
    if (graft.functions.TopKBy.isIntegralId(nidType))
      cand.groupBy($"qid")
        .agg(graft.functions.TopKBy.topKMin($"nd", $"nid", kTop).as("top"))
        .select($"qid".as("query_id"), explode($"top").as("t"))
        .select($"query_id",
          // TopKBy state widens to bigint; restore the caller's id type
          $"t.id".cast(nidType).as("neighbor_id"),
          $"t.score".as("dist2"))
    else {
      val rn = row_number().over(
        Window.partitionBy($"qid").orderBy($"nd", $"nid"))
      cand.withColumn("rn", rn).filter($"rn" <= kTop)
        .select($"qid".as("query_id"), $"nid".as("neighbor_id"),
          $"nd".as("dist2"))
    }
  }

  /** The full production ANN serving pipeline in one plan — IVF-PQ with
    * exact re-rank, the FAISS `IVFx,PQy` shape:
    *
    *  1. each query probes its `nprobe` nearest trained centroids
    *     (map-side kernel over the broadcast k×dim model);
    *  2. candidates come from ONLY those inverted lists, and are scored
    *     by ASYMMETRIC distance against their 8-byte PQ codes — the
    *     probe scans `nprobe/k` of the corpus and reads codes, never
    *     full vectors;
    *  3. the per-query ADC `shortlist` re-ranks by EXACT distance (the
    *     only place full candidate vectors are touched), and the final
    *     `kTop` emerge.
    *
    * Tie rules pinned for the oracle at every stage: probe (round-6
    * centroid distance, cluster), shortlist (round-6 ADC, id), final
    * (round-6 exact distance, id). Self-matches excluded. The PQ
    * codebook is the md5-sampled [[Pq.codebookRows]] model — at serving
    * scale both models (centroids + codebook) are a few KB broadcast,
    * the inverted lists are (cluster, id, codes) rows, and the exact
    * re-rank joins `shortlist × queries` ids back to vectors — the
    * recall/latency dial is (nprobe, shortlist), with the exact re-rank
    * capping the ADC approximation error at the list it actually
    * returns.
    *
    * Output: (query_id, rank, neighbor_id, dist2) — exact round-6
    * squared distance, rank 1..kTop. */
  def ivfPqTopK(model: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, queryPred: Column, kTop: Int = 5,
                nprobe: Int = 2, shortlist: Int = 25, m: Int = 8,
                kCodes: Int = 16): DataFrame = {
    require(kTop >= 1 && shortlist >= kTop,
      "need kTop >= 1 and shortlist >= kTop")
    val cents = modelCentroids(model)
    require(nprobe >= 1 && nprobe <= cents.size, "nprobe must be in [1, k]")
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (v0, dim) = Pq.vectors(Par.ensure(corpus), idCol, vecCol)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val cb = Pq.codebookRows(v0, kCodes)
    require(cb.size == kCodes,
      s"corpus has fewer than $kCodes vectors for the codebook")
    // assignment feeds the codes-only lists AND the exact re-rank side
    val aa = assignAgainst(corpus, idCol, vecCol, cents).materialized()
    val lists = aa.select($"cluster", $"vid",
      graft.functions.PqKernels.pqEncode($"v", cb, m)
        .getField("codes").as("cs"))
    val queries = v0.filter(queryPred)
      .select(col("vid").as("qid"), col("v").as("qv"))
    val probes = queries.select($"qid", $"qv",
      explode(graft.functions.PqKernels.centroidProbe($"qv", cents, nprobe))
        .as("cluster"))
    val adc = probes.join(lists, Seq("cluster"))
      .filter($"vid" =!= $"qid")
      .select($"qid", $"qv", $"vid".as("nid"),
        round(graft.functions.PqKernels.adcDist($"qv", $"cs", cb, m), 6)
          .as("adist"))
    val short = adc.withColumn("ra", row_number().over(
        Window.partitionBy($"qid").orderBy($"adist", $"nid")))
      .filter($"ra" <= shortlist)
    short
      .join(aa.select($"vid".as("nid"), $"v"), Seq("nid"))
      .select($"qid", $"nid", round(Pq.d2($"qv", $"v"), 6).as("dist2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"dist2", $"nid")).cast("int"))
      .filter($"rank" <= kTop)
      .select($"qid".as("query_id"), $"rank", $"nid".as("neighbor_id"),
        $"dist2")
  }

  /** One-shot composition of [[train]] + [[ivfTopK]] (the q95 gate
    * shape: every corpus vector queries the index). Convenience for
    * exploratory use — anything repeated should persist [[train]]'s
    * model once and probe it with [[ivfTopK]] directly instead of
    * re-paying `iters` full-corpus training scans per call. */
  def kmeansIvfTopK(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int = 8, iters: Int = 2, kTop: Int = 5,
                    nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1 && nprobe <= k, "nprobe must be in [1, k]")
    ivfTopK(train(emb, idCol, vecCol, k, iters), emb, emb, idCol, vecCol,
      kTop, nprobe)
  }
}
