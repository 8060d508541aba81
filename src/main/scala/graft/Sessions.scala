package graft

import org.apache.spark.sql.SparkSession

/** The engine's required session configuration in one place — what a user
  * of the library applies to their own cluster session, and what every
  * local entry point (Verify/Bench/Smoke/PlanAudit) builds from.
  *
  * Required semantics:
  *  - `caseSensitive=true`: dynamic XML schemas legitimately contain
  *    case-colliding columns (the 1C dialect emits both `ID` and `id`);
  *    the default resolver would reject them as ambiguous.
  *  - `nanosAsLong=true`: TIMESTAMP(NANOS) parquet inputs arrive as LONG
  *    nanoseconds ([[graft.queries.Tables]] converts to microsecond
  *    timestamps); without it the read throws.
  *  - UTC session time zone: timestamp results must not depend on the
  *    submitting machine's locale.
  *
  * Tuning defaults (overridable on the returned builder):
  *  - shuffle partitions sized to the core count given (a real cluster
  *    sizes this to ~2-3x total cores / target partition size instead);
  *  - AQE stays ON (Spark default) for runtime coalescing and skew splits.
  *
  * Cluster resilience: every lineage-truncating materialization in the
  * engine routes through [[graft.analytics.Par.materialize]], which
  * defaults to executor-local blocks (fast; right for local mode and
  * stable clusters). On preemptible/dynamic-allocation clusters set
  * `spark.graft.checkpoint.dir` to an HDFS/S3 path (or call
  * `sparkContext.setCheckpointDir`) and every site upgrades to a
  * reliable `checkpoint()` that survives executor loss.
  */
object Sessions {

  /** Builder with the engine's required semantics applied; caller sets
    * master/shuffle sizing or takes the locals below. Also registers the
    * native kernels as SQL functions ([[GraftExtensions]]) so
    * `spark.sql("SELECT cosine_sim(…)")` works out of the box. */
  def configured(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the reference's charset-fallback chain (S4) includes
      // windows-1251/1252; Spark 4 rejects them as CSV/text encodings
      // unless java charsets are allowed
      .config("spark.sql.legacy.javaCharsets", "true")

  /** A local[n] session for the driver harness and tests. */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val spark = configured(SparkSession.builder())
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      // NOTE on AQE initialPartitionNum: the canonical cluster posture
      // (plan shuffles wide, AQE coalesces small ones to the advisory
      // size) was TRIED at 16x cores and reverted — bracketed A/B on
      // the heavy iterative queries measured ~50% regressions locally
      // (q204 2.2->6.6 s, q199 4.3->9.3 s steady medians): every round
      // of an iterative op pays the 512-way shuffle-WRITE fan-out
      // (tiny blocks) that read-side coalescing never earns back at
      // single-box volumes. On a real cluster with executor-count
      // parallelism and real data volumes, set it to 2-3x total cores;
      // here the core-count default is the measured optimum.
      .config("spark.ui.enabled", "false")
      // the codegen class cache defaults to 100 entries — a 286-query
      // catalog cycles hundreds of distinct generated classes, so under
      // catalog-interleaved bench passes every pass recompiled every
      // query (~+45 ms median on sub-second steady medians, measured
      // r14). Class metadata lives in metaspace; thousands of entries
      // are cheap on a driver-sized JVM. Static conf — must be set at
      // session build time.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
