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
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

object Catalog {
  def all: Seq[Q] =
    CoreQueries.all ++ AnalyticsQueries.all

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
