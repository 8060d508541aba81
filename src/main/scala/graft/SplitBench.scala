package graft

import org.apache.spark.sql.SparkSession

/** Manual throughput comparison of the S2 element splitter vs the native
  * multiLine scan on a large single-file feed (evidence for SCALE.md; not
  * run by the driver). Usage: runMain graft.SplitBench <feed.xml>. */
object SplitBench {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/big_feed.xml")
    val spark = Sessions.local(32, appName = "graft-splitbench")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[splitbench] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.1fs  rows=$n")
    }
    // warm the JVM/codegen on a small read first
    spark.read.text(path).limit(10).count()
    time("readSplit (distributed)") {
      sources.XmlSource.readSplit(spark, path, sources.XmlSource.Yml).count()
    }
    time("multiLine (single-core)") {
      spark.read.format("xml")
        .option("rowTag", "offer")
        .option("attributePrefix", sources.XmlSource.AttrPrefix)
        .option("valueTag", sources.XmlSource.ValueTag)
        .option("ignoreSurroundingSpaces", "true")
        .load(path).count()
    }
    spark.stop()
  }
}
