package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — query set × corpus with the corpus
  * broadcast when small, expressed entirely with codegen'd array expressions
  * (`zip_with` + `aggregate`), no UDFs.
  *
  * Scale path: IVF-style coarse quantization — pick deterministic centroid
  * rows, assign every vector to its nearest centroid (broadcast of the tiny
  * centroid set), then answer queries by probing only the closest `nprobe`
  * inverted lists. At 100 TB the corpus-side join key is the centroid id, so
  * the candidate set per query is |corpus| / nCentroids * nprobe instead of
  * |corpus|.
  */
object Similarity {

  /** Cast float embedding to double for stable, oracle-matching arithmetic. */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic order, no reassociation.
    * (Composed HOF form, kept for reference/tests; the hot path uses the
    * codegen'd expression below.) */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine via the native codegen'd [[graft.functions.CosineSimilarity]]
    * expression: one fused whole-stage-codegen loop instead of three
    * interpreted higher-order-function passes; bit-identical results. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). `corpus` is broadcast — the baseline for
    * corpora that fit an executor; see [[ivfTopK]] for the scale path. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val v = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val q = v.filter(queryPred).select($"vid".as("qid"), $"v".as("qv"))
    val scored = q.join(broadcast(v), $"qid" =!= $"vid")
      .withColumn("cos_sim", round(cosine($"qv", $"v"), 6))
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"vid")
    scored
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"qid", $"rn", $"vid".as("neighbor_id"), $"cos_sim")
  }

  /** IVF-bucketed approximate top-k. Deterministic "training": every
    * `centroidStride`-th vector (by id) is a centroid. Assignment and probe
    * both broadcast only the centroid set. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int,
              centroidStride: Int = 50, nprobe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val v = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val cents = v.filter($"vid" % centroidStride === 0)
      .select($"vid".as("cid"), $"v".as("cv"))

    // invert: each corpus vector -> its nearest centroid id.
    // Argmax via max_by (partial-aggregable, map-side combine) instead of a
    // row_number window: the window would SHUFFLE n×|centroids| rows; here
    // the shuffle carries one partial max per vector. Tie-break = highest
    // csim then LOWEST cid, encoded as max of (csim, -cid).
    val assigned = v.join(broadcast(cents), lit(true))
      .withColumn("csim", round(cosine($"v", $"cv"), 6))
      .groupBy($"vid")
      .agg(max_by($"cid", struct($"csim", -$"cid")).as("cid"),
           first($"v").as("v"))

    // queries probe their nprobe nearest centroids
    val q = v.filter(queryPred).select($"vid".as("qid"), $"v".as("qv"))
    val probeW = Window.partitionBy($"qid").orderBy($"csim".desc, $"cid")
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("csim", round(cosine($"qv", $"cv"), 6))
      .withColumn("crn", row_number().over(probeW))
      .filter($"crn" <= nprobe)
      .select($"qid", $"qv", $"cid")

    // candidates = union of the probed inverted lists only
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"vid")
    probes.join(assigned, Seq("cid"))
      .filter($"qid" =!= $"vid")
      .withColumn("cos_sim", round(cosine($"qv", $"v"), 6))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"qid", $"rn", $"vid".as("neighbor_id"), $"cos_sim")
  }
}
