package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog hygiene: every query carries a real doc string and a
  * well-formed name, and the committed docs/OPERATORS.md is in sync
  * with the live catalog (the generated index is the user's map of the
  * 270+ operator surface — silent drift would hand them a stale one). */
class CatalogDocsSpec extends AnyFunSuite {

  test("every catalog query has a doc string that actually documents") {
    val thin = queries.Catalog.all.filter(_.doc.trim.length < 40)
    assert(thin.isEmpty,
      s"queries with missing/thin docs: ${thin.map(_.name).mkString(", ")}")
  }

  test("every catalog query name is qNNN_snake and numbers are unique") {
    val re = "^q(\\d+)_[a-z0-9_]+$".r
    val bad = queries.Catalog.all.map(_.name)
      .filterNot(re.matches(_))
    assert(bad.isEmpty, s"malformed names: ${bad.mkString(", ")}")
    val nums = queries.Catalog.all.map(_.name)
      .flatMap(n => re.findFirstMatchIn(n).map(_.group(1).toInt))
    val dup = nums.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dup.isEmpty, s"duplicate query numbers: ${dup.mkString(", ")}")
  }

  test("docs/OPERATORS.md is committed and in sync with the catalog " +
       "(regenerate with: sbt \"runMain graft.Docs\")") {
    val p = java.nio.file.Paths.get("docs/OPERATORS.md")
    assert(java.nio.file.Files.exists(p), s"$p missing — run graft.Docs")
    assert(java.nio.file.Files.readString(p) == Docs.render(),
      "docs/OPERATORS.md is stale — run: sbt \"runMain graft.Docs\"")
  }
}
