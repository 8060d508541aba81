package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage-reduction step an embedding
  * corpus takes before ANN serving (4× smaller vectors, distance ranking
  * approximately preserved). Symmetric per-vector scheme:
  *
  *   scale = max|v| / 127,   q_i = clamp(floor(v_i/scale + 0.5), -127, 127)
  *
  * `floor(x + 0.5)` instead of `round()` because round-half rules differ
  * across engines (half-even vs half-away); floor is the same IEEE
  * operation everywhere, so a SQL oracle reproduces the integers exactly.
  * Entirely map-side — one projection, no shuffle at any scale. */
object Quantize {

  /** Input scrub: null and NaN elements read as 0.0. Without it, Spark's
    * null/NaN-skipping least/greatest would quantize a MISSING dimension
    * to +127 (least(127, null) = 127), fabricating a max-positive
    * component. Infinite elements remain out of contract (finite-input
    * operator). */
  private def finite(vecCol: String): Column =
    transform(Similarity.asDouble(col(vecCol)),
              x => nanvl(coalesce(x, lit(0.0)), lit(0.0)))

  private def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** clamp(floor(x/scale + 0.5), -127, 127) — ONE definition shared by
    * summary and vector forms so they can never desynchronize. */
  private def quant(v: Column, scale: Column): Column =
    transform(v, x =>
      greatest(lit(-127L), least(lit(127L), floor(x / scale + lit(0.5)))))

  private def live(scale: Column): Column =
    scale.isNotNull && scale > 0

  /** Per-vector int8 quantization summary: the scale plus exact integer
    * norms of the quantized vector (the values an ANN layer consumes).
    * Degenerate all-zero vectors get scale 0 and zero norms. */
  def int8Summary(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = finite(vecCol)
    val scale = scaleOf(v)
    val qq = quant(v, scale)
    emb.select(
      col(idCol).as("vec_id"),
      when(live(scale), round(scale, 6)).otherwise(lit(0.0)).as("qscale"),
      when(live(scale), aggregate(qq, lit(0L), (acc, x) => acc + abs(x)))
        .otherwise(lit(0L)).as("q_l1"),
      when(live(scale), aggregate(qq, lit(0L), (acc, x) => acc + x * x))
        .otherwise(lit(0L)).as("q_l2sq"))
  }

  /** The quantized vector itself plus its scale, for pipelines that store
    * the compressed form (int8 array + one float per vector). */
  def int8Vectors(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = finite(vecCol)
    val scale = scaleOf(v)
    emb.select(
      col(idCol).as("vec_id"),
      when(live(scale), scale).otherwise(lit(0.0)).as("scale"),
      when(live(scale), transform(quant(v, scale), x => x.cast("tinyint")))
        .otherwise(transform(v, _ => lit(0).cast("tinyint"))).as("q"))
  }

  /** Dequantize back to doubles: q_i * scale. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, x => x.cast("double") * scaleCol)
}
