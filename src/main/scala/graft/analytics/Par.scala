package graft.analytics

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy map stages. A small input file (one
  * parquet row group) plans as ONE scan partition, so everything fused
  * above the first exchange — tokenization, shingling, hashing, vector
  * math — runs on one core while the rest idle. At corpus scale inputs
  * have thousands of splits and this helper is a NO-OP (no added shuffle);
  * it only round-robins when the scan is pathologically under-split
  * relative to the cluster's slots.
  */
object Par {

  /** ANSI-safe ratio: `num / den` with a NULL-on-nonpositive denominator.
    * Spark's ANSI mode (this project's sessions) evaluates division
    * EAGERLY as a shared subexpression, so `when(den > 0, num / den)`
    * still throws DIVIDE_BY_ZERO when den = 0 — the guard must live on
    * the denominator itself. Every ratio in the analytics package routes
    * through here so the next one cannot reintroduce the bug class. */
  def safeDiv(num: org.apache.spark.sql.Column,
              den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    num / org.apache.spark.sql.functions.when(den > 0, den)

  def ensure(df: DataFrame): DataFrame = {
    // streaming plans have no .rdd and micro-batch sizing is the
    // scheduler's concern — pass through untouched
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the RDD but runs no job
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
  }
}
