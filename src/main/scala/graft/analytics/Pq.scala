package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the codebook-compression ANN scale path
  * beyond [[Quantize]]'s int8: each vector is split into `m` subspaces and
  * every subspace is replaced by the index of its nearest codebook entry,
  * so a 64-dim float vector serves from `m` small ints (+ one shared
  * codebook). At 100 TB this is the difference between ANN state that
  * fits executor memory and ANN state that doesn't: the corpus side of
  * the ADC probe carries only the codes, never the vectors.
  *
  * Deterministic "training" in the spirit of [[Similarity.isCentroid]]:
  * the codebook is the `k` corpus vectors with the smallest
  * `(md5(id), id)` — a reproducible pseudo-random sample that a SQL
  * oracle reproduces exactly (swap in k-means offline when quality
  * matters; every downstream shape is unchanged).
  *
  * Scale shapes:
  *  - codebook: a bounded TakeOrdered (k rows) collected to the driver —
  *    the dimension-sized model-broadcast pattern, never corpus-sized.
  *  - encode: ONE map-side projection against the codebook literal; no
  *    shuffle at any corpus size.
  *  - ADC top-k: broadcast the (tiny) query set, probe the code table
  *    map-side (m sub-distances per pair instead of a full-dim scan),
  *    then one per-query top-k aggregation.
  *
  * Distances are squared-Euclidean folded in index order, so the oracle's
  * `list_distance²` agrees to float ulps; ranking keys round to 6 decimals
  * before the window so summation-order ulps can't flip a rank.
  */
object Pq {

  /** The majority vector length, mirrored from [[Similarity]]'s guard: a
    * corrupt off-dimension row must not poison the codebook or crash the
    * slicing (ties break to the smaller dim). */
  private def majorityDim(v: DataFrame): Int =
    v.groupBy(size(col("v")).as("d")).count()
      .orderBy(col("count").desc, col("d"))
      .head(1).headOption.map(_.getInt(0)).getOrElse(0)

  /** Uniform-dim corpus as (vid, v double[]). */
  private[analytics] def vectors(emb: DataFrame, idCol: String, vecCol: String)
      : (DataFrame, Int) = {
    val v0 = emb.select(col(idCol).as("vid"),
      Similarity.asDouble(col(vecCol)).as("v"))
    val dim = majorityDim(v0)
    (v0.filter(size(col("v")) === dim), dim)
  }

  /** The k codebook vectors, as driver arrays in codebook order
    * (ascending `(md5(id), id)`). Bounded: k × dim doubles. */
  private[analytics] def codebookRows(v: DataFrame, k: Int): Seq[Seq[Double]] =
    v.orderBy(md5(col("vid").cast("string")), col("vid")).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq

  /** Squared Euclidean distance between two slices, folded in index
    * order (no reassociation — cross-engine reproducible to ulps). */
  private[analytics] def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Per-subspace best codebook entries for a vector column: an array of
    * m structs (j, d) — argmin over the k codebook slices, ties to the
    * smallest j (strict `<` keeps the first minimum). COMPOSED
    * higher-order-function reference form: the hot path uses the native
    * [[graft.functions.PqKernels]] codegen kernel (one fused primitive
    * loop instead of m·k interpreted lambda passes); PqSpec asserts
    * bit-parity between the two. */
  private[analytics] def bestPerSubspace(v: Column, cb: Seq[Seq[Double]],
                              m: Int, sub: Int): Column = {
    val cbLit = typedLit(cb)
    transform(sequence(lit(0), lit(m - 1)), s => {
      val vSub = slice(v, s * sub + 1, lit(sub))
      val start = struct(lit(-1).cast("int").as("j"),
        lit(Double.NaN).as("d"))
      aggregate(
        sequence(lit(0), lit(cb.size - 1)), start,
        (acc, j) => {
          val cSub = slice(element_at(cbLit, j.cast("int") + 1),
            s * sub + 1, lit(sub))
          val d = d2(vSub, cSub)
          // NaN-last argmin, matching the native kernel: entry 0 always
          // seeds, +Inf competes, NaN never displaces a real distance —
          // an all-NaN subspace yields (0, NaN), never j = -1
          when(acc.getField("j") === -1 ||
               (!isnan(d) && (isnan(acc.getField("d")) ||
                              d < acc.getField("d"))),
            struct(j.cast("int").as("j"), d.as("d"))).otherwise(acc)
        })
    })
  }

  /** PQ-encode the corpus: per vector, the m codebook indices (as a
    * comma-joined string — stable across engines) plus the total squared
    * quantization error. One scan, zero shuffles. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             m: Int = 8, k: Int = 16): DataFrame = {
    val (v, dim) = vectors(Par.ensure(emb), idCol, vecCol)
    require(m >= 1, "m must be >= 1")
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val cb = codebookRows(v, k)
    require(cb.size == k, s"corpus has fewer than $k vectors for the codebook")
    val enc = graft.functions.PqKernels.pqEncode(col("v"), cb, m)
    v.select(
        col("vid").as("vec_id"),
        concat_ws(",",
          transform(enc.getField("codes"), c => c.cast("string"))).as("codes"),
        round(enc.getField("qerr"), 6).as("qerr"))
  }

  /** Composed-HOF encode (reference implementation for the differential
    * spec — same output contract as [[encode]]). */
  private[analytics] def encodeComposed(emb: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int): DataFrame = {
    val (v, dim) = vectors(Par.ensure(emb), idCol, vecCol)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val cb = codebookRows(v, k)
    require(cb.size == k, s"corpus has fewer than $k vectors for the codebook")
    val sub = dim / m
    val best = bestPerSubspace(col("v"), cb, m, sub)
    v.select(
        col("vid").as("vec_id"),
        concat_ws(",",
          transform(best, b => b.getField("j").cast("string"))).as("codes"),
        round(aggregate(transform(best, b => b.getField("d")),
          lit(0.0), (acc, x) => acc + x), 6).as("qerr"))
  }

  /** Asymmetric-distance (ADC) approximate top-k: each query keeps its
    * exact vector; every corpus vector is represented only by its codes.
    * approx_dist(q, v) = Σ_s ||q_sub(s) − codebook[code_v(s)]_sub(s)||².
    * The query set is broadcast; the corpus side never materializes a
    * vector — the serving shape PQ exists for. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, kNN: Int,
              m: Int = 8, k: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (v, dim) = vectors(Par.ensure(emb), idCol, vecCol)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val cb = codebookRows(v, k)
    require(cb.size == k, s"corpus has fewer than $k vectors for the codebook")

    val enc = graft.functions.PqKernels.pqEncode(col("v"), cb, m)
    val codes = v.select(col("vid"), enc.getField("codes").as("cs"))

    val queries = v.filter(queryPred)
      .select(col("vid").as("qid"), col("v").as("qv"))

    val scored = codes.join(broadcast(queries), $"qid" =!= $"vid")
      .select($"qid", $"vid".as("neighbor_id"),
        round(graft.functions.PqKernels.adcDist($"qv", $"cs", cb, m), 6)
          .as("adist"))
    val w = Window.partitionBy($"qid").orderBy($"adist", $"neighbor_id")
    scored
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter($"rn" <= kNN)
      .select($"qid", $"rn", $"neighbor_id", $"adist")
  }
}
