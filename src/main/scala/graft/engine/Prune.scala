package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** P1-P4 — column pruning (reference main.py:1544-1565).
  *
  * P3 is data-DEPENDENT (drop a column iff every value is blank or
  * 'Undefined'), so it cannot be a Catalyst rewrite; it is the documented
  * 2-job pattern: one single-pass aggregate over all columns (partial aggs
  * map-side, one row out), then a driver-side `drop`. Cost at scale: one
  * full scan producing 1 row — no shuffle of the data itself.
  */
object Prune {

  /** Per-column "has a real value" indicator (P3/A9, main.py:1554-1560):
    * 1 if any value is non-blank and != 'Undefined'. */
  def hasValueAgg(df: DataFrame): Seq[Column] =
    df.schema.fields.toSeq.map { f =>
      // backtick-quote: col("4.5") would parse the dot as a struct-field
      // path (numeric-NAMED columns are exactly the P4 case)
      val c = col("`" + f.name + "`")
      val present = f.dataType match {
        case StringType => c.isNotNull && trim(c) =!= "" && c =!= "Undefined"
        case _          => c.isNotNull
      }
      max(when(present, 1).otherwise(0)).as(f.name)
    }

  /** P3 + P4 + P1/P2: drop all-empty columns (data-driven), numeric-named
    * columns, and statically excluded columns — except `important` ones
    * (main.py:1549-1552).
    */
  def prune(df: DataFrame,
            exclude: Seq[String] = Nil,
            important: Set[String] = Set.empty,
            dropNumericNames: Boolean = true): DataFrame = {
    val aggs = hasValueAgg(df)
    val flags = df.agg(aggs.head, aggs.tail: _*).collect().head
    // on an empty input the max() aggregates are null → every column counts
    // as empty (matches the reference: no rows means nothing to keep)
    val emptyCols = df.schema.fieldNames.zipWithIndex.collect {
      case (n, i) if flags.isNullAt(i) || flags.getInt(i) == 0 => n
    }.toSet
    val numericNamed =
      if (dropNumericNames)
        // same predicate as F14/CleanFns.isNumericString (reference
        // main.py:1564: s.replace('.','',1).isdigit()) — accepts "5." and
        // ".5"; the previous \d+(\.\d+)? form kept those, diverging from
        // the param-key filter that uses the F14 form
        df.schema.fieldNames
          .filter(_.matches("""\d+\.?\d*|\.\d+""")).toSet
      else Set.empty[String]
    val toDrop =
      (emptyCols ++ numericNamed ++ exclude.toSet) -- important
    df.drop(toDrop.toSeq: _*)
  }

  /** T1: reference emits columns in sorted order (main.py:1562-1565).
    * Backtick-quoted for the same reason as [[hasValueAgg]]: param-derived
    * column names legitimately contain dots. */
  def sortedColumns(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.map(n => col("`" + n + "`")).toSeq: _*)
}
