package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.configured(SparkSession.builder())
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // a STARTUP conf (read when a reliable checkpoint registers for
      // cleanup): lets ParSpec assert that long-lived reliable-path
      // sessions actually reap checkpoint files on RDD GC
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Evaluate a scalar Column expression over a one-row frame. */
  def evalStr(c: org.apache.spark.sql.Column): String = {
    val row = spark.range(1).select(c.as("v")).collect().head
    if (row.isNullAt(0)) null else row.getString(0)
  }
  def evalBool(c: org.apache.spark.sql.Column): Boolean =
    spark.range(1).select(c.as("v")).collect().head.getBoolean(0)
}
