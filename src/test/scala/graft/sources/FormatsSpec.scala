package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ORC interchange coverage: fidelity plus the two scan properties that
  * matter at 100 TB — predicate pushdown and column pruning reaching the
  * ORC reader exactly as they do the parquet one. */
class FormatsSpec extends SparkTestBase {

  private def writeOrc(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
    dir.toFile.deleteOnExit()
    val path = dir.resolve("documents").toString
    graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .write.mode("overwrite").orc(path)
    path
  }

  test("ORC round-trip preserves every row and column bit-for-bit") {
    val path = writeOrc()
    val src = graft.queries.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val back = spark.read.orc(path)
    assert(back.schema === src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("ORC scan pushes predicates and prunes columns") {
    val path = writeOrc()
    val q = spark.read.orc(path)
      .filter(col("n_chars") > 100L)
      .select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), " +
             "GreaterThan(n_chars,100)"),
           s"n_chars filter must reach the ORC scan:\n$plan")
    // pruned read schema: only the projected + filter columns, no text
    assert(!plan.matches("(?s).*ReadSchema:[^\\n]*text.*"),
           s"text column must not be read:\n$plan")
  }
}
