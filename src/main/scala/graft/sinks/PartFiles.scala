package graft.sinks

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Shared single-file assembly: serialize rows DISTRIBUTED via the text
  * writer, then byte-concatenate the part files on the driver in partition
  * order. The driver copy is the only serial step — inherent to "one
  * file"; the expensive per-row string building runs across all cores. */
object PartFiles {

  /** Write `lines` (single string column named `value`) as text parts under
    * a temp dir, stream the part bytes into `out` in name order, delete the
    * temp dir. `lineSep` is appended after EVERY row by the writer. */
  def drain(lines: org.apache.spark.sql.DataFrame, out: java.io.OutputStream,
            lineSep: String): Unit = {
    val tmp = Files.createTempDirectory("graft_parts")
    val dir = tmp.resolve("parts")
    try {
      // AQE's partition coalescing sees a few-MB shuffle and folds the
      // whole write into ONE task — which serializes every row's string
      // building onto one core (the sink's only CPU-heavy stage). Keep the
      // planned partitioning for this write; part-file name order is
      // partition order, so the concatenated bytes are unchanged.
      val spark = lines.sparkSession
      val conf = "spark.sql.adaptive.coalescePartitions.enabled"
      val prev = spark.conf.getOption(conf)
      spark.conf.set(conf, "false")
      try
        lines.write.mode("overwrite").option("lineSep", lineSep)
          .text(dir.toString)
      finally prev.foreach(spark.conf.set(conf, _))
      val listing = Files.list(dir)
      val parts =
        try listing.iterator().asScala.toSeq finally listing.close()
      parts
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("part-") && !n.endsWith(".crc")
        }
        .sortBy(_.getFileName.toString)
        .foreach(p => Files.copy(p, out))
    } finally {
      val walk = Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach((p: Path) => Files.deleteIfExists(p))
    }
  }
}
