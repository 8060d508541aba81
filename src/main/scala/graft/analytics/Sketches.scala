package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches for corpus statistics: HyperLogLog and
  * k-minimum-values distinct-count estimates per group — the
  * capacity-planning numbers (distinct tokens/shingles per source or
  * shard) that exact `count(distinct)` can't deliver at 100 TB without a
  * full token-keyed shuffle. Both are deterministic BY CONSTRUCTION
  * (md5-derived hashes, integer register/sketch state, one final IEEE
  * division), so DuckDB oracles reproduce them bit-for-bit — unlike
  * Spark's own `approx_count_distinct`, whose HLL++ hash is engine-
  * private and un-oracle-able.
  *
  * Scale shapes: HLL state is 64 registers per group, KMV state is k
  * longs per group, and BOTH aggregate with map-side partials (HLL via
  * plain max/sum aggs, KMV via the bounded native
  * [[graft.functions.KmvSketch]] aggregate) — no per-group sort, no
  * unbounded collect, no funnel through one task for a hot group.
  */
object Sketches {

  /** First 15 md5 nibbles as a uniform 60-bit non-negative int64 — the
    * engine-portable hash (16 nibbles could overflow the signed cast). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val m = 64                    // registers (b = 6 index bits)
  private val twoP55 = 36028797018963968L // 2^55: the integer register scale
  // alpha_m * m^2 * 2^55, composed left-to-right exactly as the oracle SQL
  // writes it so both engines build the identical double constant
  private val hllNum = ((0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0) *
    36028797018963968.0

  /** Append the HLL columns for `value`: `bucket` (low 6 hash bits) and
    * `rho` (trailing-zero rank of the upper 54 bits, +1; 55 caps the
    * all-zero case — computed as `floor(log2(w & -w))`, exact in IEEE
    * because `w & -w` is a power of two). Shared by the batch estimator
    * and the STREAMING register aggregation
    * ([[graft.streaming.EventStreams]]) — one expression builder, so the
    * two paths cannot drift. */
  def withHllCols(df: DataFrame, value: Column): DataFrame =
    df.withColumn("h", h60(value))
      .withColumn("bucket", (col("h") % m).cast("int"))
      .withColumn("w", expr(s"h DIV $m"))
      .withColumn("rho", when(col("w") === 0, lit(55)).otherwise(
        (floor(log2(col("w").bitwiseAND(-col("w")))) + 1).cast("int")))
      .drop("h", "w")

  /** Fold a register table `(keyCols..., r)` — one row per non-empty
    * register — into `(keyCols..., n_registers, est_distinct)`. Register
    * sums use INTEGER `2^(55-r)` terms so no addition-order rounding can
    * diverge between engines; the only floating math is the final
    * division and (in the sparse regime) the standard linear-counting
    * correction `m * ln(m / V)` when the raw estimate is under 2.5m and
    * empty registers remain. Mergeable by construction: registers from
    * any partial run (a stream's state store, per-shard sketches) max
    * together before this fold. */
  def estimateFromRegisters(regs: DataFrame,
                            keyCols: Seq[String]): DataFrame = {
    import regs.sparkSession.implicits._
    regs.groupBy(keyCols.map(col): _*)
      .agg(sum(expr("shiftleft(cast(1 as bigint), 55 - r)")).as("s"),
        count(lit(1)).as("nb"))
      .withColumn("total",
        $"s" + (lit(m.toLong) - $"nb") * lit(twoP55))
      .select(keyCols.map(col) :+
        $"nb".cast("long").as("n_registers") :+
        round({
          val raw = lit(hllNum) / $"total".cast("double")
          val v = lit(m.toLong) - $"nb" // empty registers
          when(raw <= lit(2.5 * m) && v > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
            .otherwise(raw)
        }, 6).as("est_distinct"): _*)
  }

  /** HyperLogLog distinct estimate of `value` per `keyCol` (m = 64
    * registers): [[withHllCols]] -> per-(key, bucket) max ->
    * [[estimateFromRegisters]].
    *
    * Output: (key, n_registers, est_distinct). */
  def hllDistinct(df: DataFrame, keyCol: String, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val regs = withHllCols(
        Par.ensure(df).select(col(keyCol).as("key"), value.as("v0")),
        $"v0")
      .groupBy($"key", $"bucket").agg(max($"rho").as("r"))
    estimateFromRegisters(regs, Seq("key"))
      .withColumnRenamed("key", keyCol)
  }

  /** Count-Min sketch counters of `value` per `keyCol`: `depth` rows of
    * `width` integer counters, bucket `d` = md5("d|value") — the bounded
    * frequency table (depth x width longs per group) where an exact
    * per-token count table is vocabulary-sized. Counters are plain sums:
    * map-side partials, mergeable across shards/streams by addition.
    * Output: (key, d, bucket, c). */
  def cmCounters(df: DataFrame, keyCol: String, value: Column,
                 depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    Par.ensure(df)
      .select(col(keyCol).as("key"), value.as("v0"))
      .select($"key", $"v0",
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select($"key", $"d",
        (conv(substring(md5(concat($"d".cast("string"), lit("|"), $"v0")),
          1, 8), 16, 10).cast("long") % width).cast("int").as("bucket"))
      .groupBy($"key", $"d", $"bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates from [[cmCounters]] for literal `probes`:
    * `est = min over d of counter[d][bucket_d(probe)]` (missing counter
    * rows read 0). The probe grid is (distinct keys x probes x depth) —
    * dictionary-sized — and the counter side is depth x width per key,
    * so the whole probe is broadcast-scale regardless of corpus size.
    * Output: (key, word, est). */
  def cmEstimate(counters: DataFrame, probes: Seq[String],
                 depth: Int = 4, width: Int = 64): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    val spark = counters.sparkSession
    import spark.implicits._
    val probeRows = probes.flatMap { p =>
      (0 until depth).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$d|$p".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
          ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
        (p, d, (h % width).toInt)
      }
    }
    val pdf = probeRows.toDF("word", "d", "bucket")
    counters.select($"key").distinct()
      .crossJoin(broadcast(pdf))
      .join(counters, Seq("key", "d", "bucket"), "left")
      .groupBy($"key", $"word")
      .agg(min(coalesce($"c", lit(0L))).as("est"))
  }

  /** k-minimum-values distinct estimate of `value` per `keyCol`: keep the
    * k smallest distinct 60-bit hashes (the bounded native
    * [[graft.functions.KmvSketch]] aggregate), then
    * `est = (k-1) / (h_k / 2^60)`; a group with fewer than k distinct
    * values returns its EXACT count (the sketch holds the whole set).
    *
    * Output: (key, n_sketch, est_distinct). */
  def kmvDistinct(df: DataFrame, keyCol: String, value: Column,
                  k: Int = 16): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    Par.ensure(df)
      .select(col(keyCol).as("key"), h60(value).as("h"))
      .groupBy($"key")
      .agg(graft.functions.KmvSketch.kmvMinHashes($"h", k).as("mins"))
      .select($"key".as(keyCol),
        size($"mins").cast("long").as("n_sketch"),
        round(when(size($"mins") < k, size($"mins").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at($"mins", k).cast("double") /
              lit(1152921504606846976.0))), 6).as("est_distinct"))
  }
}
