package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-table layout: the write-once / join-many physical design for
  * id-keyed fact tables. Writing both sides of a recurring join bucketed
  * (and bucket-sorted) by the join key means every later join reads
  * pre-partitioned data — the scan reports the bucket spec's hash
  * partitioning, `EnsureRequirements` inserts NO shuffle on either side,
  * and at 100 TB the join that would move both tables through an
  * all-to-all exchange becomes a per-bucket streamed merge. This is the
  * standing answer for pipelines that repeatedly join a text table with
  * its embedding/feature/score sibling (SemDeDup labeling, ANN result
  * joins, quality-score attachment): pay one partitioned write, then
  * every downstream join is shuffle-free.
  *
  * The helper repartitions by the bucket key into exactly `buckets`
  * partitions before writing: Spark's bucket assignment and its shuffle
  * hash are the same Murmur3-pmod function, so each write task holds
  * exactly one bucket and emits ONE file per bucket — the layout that
  * also lets the bucket-sort metadata eliminate the join's Sort when the
  * reader supports it.
  */
object Bucketing {

  /** Drop-and-rewrite `table` as a parquet table bucketed and
    * bucket-sorted by `keyCol` at `path` (external location, so the
    * caller controls the artifact's lifetime). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keyCol: String, buckets: Int): Unit = {
    require(buckets >= 1, "buckets must be >= 1")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(buckets, col(keyCol))
      .write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Stable short hex digest for artifact paths keyed by an input dir. */
  def pathKey(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
}
