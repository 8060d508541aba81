package graft.sinks

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  private def partFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val listing = Files.list(dir)
    try listing.iterator().asScala.toSeq.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("part-") && n.endsWith(".parquet")
    } finally listing.close()
  }

  /** Rows the parquet reader actually DECODED (scan metric after pushed
    * row-group/file pruning) — the data-skipping measurement. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other +: other.children.flatMap(unwrap)
    }
    unwrap(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("compactParquet: 64 small files fold into the size-targeted " +
       "count with identical content") {
    val tmp = Files.createTempDirectory("graft_layout")
    try {
      val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      val small = tmp.resolve("small").toString
      val out = tmp.resolve("compact").toString
      docs.repartition(64).write.mode("overwrite").parquet(small)
      assert(partFiles(tmp.resolve("small")).size === 64)
      val total = Layout.dataBytes(spark, small)
      val n = Layout.compactParquet(spark, small, out,
        targetBytes = math.ceil(total / 4.0).toLong)
      assert(n === 4, s"expected 4 target files for total=$total")
      assert(partFiles(tmp.resolve("compact")).size === 4)
      // content identical: same (doc_id, md5) multiset
      val a = docs.select(col("doc_id"), md5(col("text")).as("h"))
        .orderBy("doc_id").collect().toSeq
      val b = spark.read.parquet(out)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .orderBy("doc_id").collect().toSeq
      assert(a === b)
    } finally {
      val walk = Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  test("writeWithBloom: an equality lookup on a shuffled key decodes " +
       "strictly fewer rows than the bloom-less layout") {
    val tmp = Files.createTempDirectory("graft_layout_b")
    try {
      val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      // round-robin striping alone leaves min/max stats useless
      val shuffled = docs.repartition(4)
      Layout.writeWithBloom(shuffled, tmp.resolve("bloom").toString,
        "doc_id", expectedNdv = 100000L)
      shuffled.write.mode("overwrite")
        .parquet(tmp.resolve("plain").toString)
      val pred = col("doc_id") === 123L
      val bRows = scanRows(
        spark.read.parquet(tmp.resolve("bloom").toString).filter(pred))
      val pRows = scanRows(
        spark.read.parquet(tmp.resolve("plain").toString).filter(pred))
      assert(pRows === docs.count(),
        "shuffled ids leave min/max stats useless: the plain layout decodes everything")
      assert(bRows < pRows,
        s"bloom must skip definitely-absent groups: decoded $bRows vs $pRows")
      assert(spark.read.parquet(tmp.resolve("bloom").toString)
        .filter(pred).count() === 1L, "the lookup still finds its row")
    } finally {
      val walk = Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  test("writeClustered: a selective range filter decodes strictly fewer " +
       "rows from the clustered layout than from the unclustered one") {
    val tmp = Files.createTempDirectory("graft_layout_c")
    try {
      val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      val clustered = tmp.resolve("clustered").toString
      val random = tmp.resolve("random").toString
      Layout.writeClustered(docs, clustered, n = 4, "n_chars")
      docs.repartition(4).write.mode("overwrite").parquet(random)
      val pred = col("n_chars") >= 400
      val cRows = scanRows(spark.read.parquet(clustered).filter(pred))
      val rRows = scanRows(spark.read.parquet(random).filter(pred))
      val expected = docs.filter(pred).count()
      assert(spark.read.parquet(clustered).filter(pred).count() === expected)
      assert(rRows === docs.count(),
        "random layout: every file's min/max admits the filter, all rows decode")
      assert(cRows < rRows,
        s"clustered layout must skip files: decoded $cRows vs $rRows")
      assert(cRows >= expected, "skipping never loses matching rows")
    } finally {
      val walk = Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  test("writeZOrdered: BOTH single-column range filters decode fewer " +
       "rows than the shuffled layout, and the second column beats the " +
       "one-column clustered layout") {
    val tmp = Files.createTempDirectory("graft_layout_z")
    try {
      val events = graft.queries.Tables(spark, "/root/testdata/sf0.001",
          "events")
        .withColumn("hr", floor(unix_timestamp(col("ts")) / 3600L)
          .cast("long"))
      val z = tmp.resolve("zorder").toString
      val shuffled = tmp.resolve("shuffled").toString
      val aOnly = tmp.resolve("aclustered").toString
      Layout.writeZOrdered(events, z, n = 16, "user_id", "hr")
      events.repartition(16).write.mode("overwrite").parquet(shuffled)
      Layout.writeClustered(events, aOnly, n = 16, "user_id")
      val total = events.count()
      val predA = col("user_id") <= 2 // sf0.001 has users 0..14
      val predB = col("hr") <= 473400L // first ~2 days
      for ((pred, name) <- Seq((predA, "user"), (predB, "hour"))) {
        val zr = scanRows(spark.read.parquet(z).filter(pred))
        val sr = scanRows(spark.read.parquet(shuffled).filter(pred))
        val expected = events.filter(pred).count()
        assert(spark.read.parquet(z).filter(pred).count() === expected,
          s"$name: z layout returns the exact answer")
        assert(sr === total,
          s"$name: shuffled layout decodes everything")
        assert(zr < sr, s"$name: z-order must skip files ($zr vs $sr)")
        assert(zr >= expected, s"$name: skipping never loses rows")
      }
      // the one-column layout is useless for the OTHER column; z-order
      // still prunes there — the whole point of interleaving
      val zB = scanRows(spark.read.parquet(z).filter(predB))
      val aB = scanRows(spark.read.parquet(aOnly).filter(predB))
      assert(zB < aB,
        s"hour filter: z-order ($zB) must beat user-clustered ($aB)")
    } finally {
      val walk = Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  test("writeZOrdered guards: empty input and over-wide domains fail " +
       "with their OWN messages, not a misleading null complaint") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_layout_guard")
    try {
      val out = tmp.resolve("out").toString
      val empty = Seq.empty[(Long, Long)].toDF("a", "b")
      val e1 = intercept[IllegalArgumentException] {
        Layout.writeZOrdered(empty, out, n = 2, "a", "b")
      }
      assert(e1.getMessage.contains("input is empty"))
      // width >= 2^47 on one column: the 16-bit normalization would
      // silently degrade — must refuse up front
      val wide = Seq((0L, 1L), (1L << 47, 2L)).toDF("a", "b")
      val e2 = intercept[IllegalArgumentException] {
        Layout.writeZOrdered(wide, out, n = 2, "a", "b")
      }
      assert(e2.getMessage.contains("2^47"))
      // FULL-range domain (signed 64-bit hashes): max - min wraps to -1
      // in Long arithmetic — the guard must still refuse
      val fullRange = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L))
        .toDF("a", "b")
      val e3 = intercept[IllegalArgumentException] {
        Layout.writeZOrdered(fullRange, out, n = 2, "a", "b")
      }
      assert(e3.getMessage.contains("2^47"))
    } finally {
      val walk = Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  test("writePartitioned: an equality predicate prunes at the LISTING " +
       "— the scan admits exactly the matching partition's files and " +
       "decodes only its rows") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_hivepart_spec")
    try {
      val out = tmp.resolve("t").toString
      val df = (0 until 400).map(i => (s"k${i % 4}", i.toLong))
        .toDF("part_key", "v")
        .repartition(4)
      Layout.writePartitioned(df, out, "part_key")
      // one subdirectory per distinct partition value
      val dirs = {
        val l = Files.list(new java.io.File(out).toPath)
        try l.iterator().asScala.toSeq
          .filter(_.getFileName.toString.startsWith("part_key="))
        finally l.close()
      }
      assert(dirs.size === 4, s"expected 4 partition dirs, got $dirs")
      val one = spark.read.parquet(out).filter($"part_key" === "k1")
      // decoded rows = the one partition's rows, and the scan's file
      // list is the one directory's files — pruning at the listing,
      // before any footer is read
      assert(scanRows(one) === 100L)
      def scanFiles(d: DataFrame): Long = {
        d.collect()
        def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
          case other => other +: other.children.flatMap(unwrap)
        }
        unwrap(d.queryExecution.executedPlan)
          .collect { case s: FileSourceScanExec => s }
          .map(_.metrics("numFiles").value).sum
      }
      val prunedFiles = scanFiles(spark.read.parquet(out)
        .filter($"part_key" === "k1"))
      val allFiles = scanFiles(spark.read.parquet(out))
      assert(prunedFiles < allFiles,
        s"pruned read must admit fewer files: $prunedFiles vs $allFiles")
      assert(prunedFiles === partFiles(dirs.find(
        _.getFileName.toString == "part_key=k1").get).size.toLong)
    } finally {
      val walk = Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }
}
