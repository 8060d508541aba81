package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator-query: the Spark implementation plus (when
  * SQL-expressible) the DuckDB oracle the driver hash-compares against.
  * Column names and row order are part of the contract — every query ends
  * with an explicit ORDER BY on its key in BOTH forms, and every computed
  * column is aliased identically in both.
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  /** Load a testdata table. The driver writes `events.ts` as
    * TIMESTAMP(NANOS), which Spark's parquet reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as a LONG of
    * nanoseconds, converted here to a microsecond timestamp (integer DIV —
    * double division would lose precision above 2^53 ns). DuckDB oracles
    * read the nanos natively, and both agree at `date_trunc` granularity.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}

object Catalog {
  def all: Seq[Q] = {
    val qs = CoreQueries.all ++ AnalyticsQueries.all ++ ConverterQueries.all ++
      MiscQueries.all
    // a duplicate name would silently DROP a query from the driver gate
    // (SparkEntry builds a Map keyed by name) — fail loudly instead
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
