package graft

/** Generator for `docs/OPERATORS.md` — the user-facing operator index
  * rendered from the live query catalog (278 entries is past what README
  * prose can index). Run `sbt "runMain graft.Docs"` after adding a query;
  * CatalogDocsSpec fails the build when the committed file drifts from
  * the catalog or a query ships without a doc string. */
object Docs {

  /** Deterministic markdown rendering of the catalog: one row per query,
    * ordered by query number, pipes escaped so doc prose can't break the
    * table. */
  def render(): String = {
    val header =
      """# Operator catalog
        |
        |Generated from `graft.queries.Catalog` by `sbt "runMain graft.Docs"`
        |— do not edit by hand. Every row is driver-gated: the Spark result
        |is hash-compared against the DuckDB oracle at sf0.01 each round
        |(rows marked `specs` carry a ScalaTest gate instead).
        |
        || query | oracle | what it computes |
        ||---|---|---|
        |""".stripMargin
    def esc(s: String): String =
      s.replace("|", "\\|").replace("\n", " ")
    def num(name: String): Int =
      "^q(\\d+)_".r.findFirstMatchIn(name).map(_.group(1).toInt)
        .getOrElse(Int.MaxValue)
    val rows = queries.Catalog.all
      .sortBy(q => (num(q.name), q.name))
      .map { q =>
        val oracle = if (q.oracle.isDefined) "DuckDB" else "specs"
        s"| ${q.name} | $oracle | ${esc(q.doc)} |"
      }
    header + rows.mkString("", "\n", "\n")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/OPERATORS.md")
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, render())
    println(s"[docs] wrote ${queries.Catalog.all.size} rows to $p")
  }
}
