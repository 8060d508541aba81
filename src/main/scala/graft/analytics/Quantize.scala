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

  private def absMax(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  /** Per-vector int8 quantization summary: the scale plus exact integer
    * norms of the quantized vector (the values an ANN layer consumes).
    * Degenerate all-zero vectors get scale 0 and zero norms. */
  def int8Summary(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = Similarity.asDouble(col(vecCol))
    val scale = absMax(v) / lit(127.0)
    val qq = transform(v, x =>
      greatest(lit(-127L), least(lit(127L), floor(x / scale + lit(0.5)))))
    val live = scale.isNotNull && scale > 0
    emb.select(
      col(idCol).as("vec_id"),
      when(live, round(scale, 6)).otherwise(lit(0.0)).as("qscale"),
      when(live, aggregate(qq, lit(0L), (acc, x) => acc + abs(x)))
        .otherwise(lit(0L)).as("q_l1"),
      when(live, aggregate(qq, lit(0L), (acc, x) => acc + x * x))
        .otherwise(lit(0L)).as("q_l2sq"))
  }

  /** The quantized vector itself plus its scale, for pipelines that store
    * the compressed form (int8 array + one float per vector). */
  def int8Vectors(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = Similarity.asDouble(col(vecCol))
    val scale = absMax(v) / lit(127.0)
    val live = scale.isNotNull && scale > 0
    emb.select(
      col(idCol).as("vec_id"),
      when(live, scale).otherwise(lit(0.0)).as("scale"),
      when(live,
        transform(v, x =>
          greatest(lit(-127L), least(lit(127L), floor(x / scale + lit(0.5))))
            .cast("tinyint")))
        .otherwise(transform(v, _ => lit(0).cast("tinyint"))).as("q"))
  }

  /** Dequantize back to doubles: q_i * scale. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, x => x.cast("double") * scaleCol)
}
