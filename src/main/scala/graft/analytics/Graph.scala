package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-analysis operators over pair tables (near-dup candidate pairs,
  * citation edges, co-occurrence graphs): PageRank and triangle/
  * clustering-coefficient counts — the graph view of a dedup run, where
  * a document's centrality in the duplicate graph ranks boilerplate
  * templates and a node's clustering separates tight clone clusters
  * from chains of pairwise-similar drift.
  *
  * Everything is edge-keyed joins + node-keyed aggregations — the
  * standard distributed shapes (no adjacency lists are ever collected,
  * no per-node windows), so the same plans run over 10^10 edges.
  */
object Graph {

  /** PageRank over an UNDIRECTED pair list: pairs symmetrize into a
    * directed edge table, every node then has in- and out-degree >= 1
    * (no dangling-mass correction needed), and `iters` rounds of the
    * standard recurrence run as join + aggregate:
    * `r'(v) = (1-d)/N + d * sum over neighbors u of r(u)/deg(u)`.
    *
    * The iteration builds ONE lazy DAG (each round's join appears once;
    * nothing is recomputed across rounds) over the persisted edge
    * table; ranks and degrees are node-keyed so every round reuses the
    * same hash partitioning. The node count N is a driver scalar — the
    * one collect, O(1). Deterministic to the 6 rounded places: the
    * recurrence is fixed-iteration with (1-d) passed as the SAME
    * interpolated constant the oracle uses; float addition order only
    * perturbs ulps, which the final round absorbs.
    *
    * Output: (node, rank) — rank rounded to 6; ranks sum to ~1. */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0.0 && damping < 1.0,
      "need iters >= 1 and damping in (0, 1)")
    val spark = pairs.sparkSession
    import spark.implicits._
    // persisted pre-partitioned on src: every round's rank join and the
    // degree agg then reuse this layout — the only per-round exchange
    // left is the contribution re-aggregation by dst, which IS the
    // round's data movement
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy($"src").agg(count(lit(1)).cast("long").as("deg"))
    val n = deg.count() // node count: the one driver scalar
    val teleport = 1.0 - damping
    var ranks = deg.select($"src".as("n"), (lit(1.0) / n).as("r"))
    for (_ <- 1 to iters) {
      ranks = edges
        .join(ranks.select($"n".as("src"), $"r"), Seq("src"))
        .join(deg, Seq("src"))
        .select($"dst".as("n"), ($"r" / $"deg").as("c"))
        .groupBy($"n")
        .agg((lit(teleport) / n + lit(damping) * sum($"c")).as("r"))
    }
    ranks.select($"n".as("node"), round($"r", 6).as("rank"))
  }

  /** Per-node triangle counts and local clustering coefficient over an
    * UNDIRECTED pair list. Each triangle {a, b, c} is enumerated exactly
    * once in canonical a < b < c orientation by the standard two-join
    * plan — edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c) — then credited to all
    * three corners; the coefficient is `2T / (deg * (deg - 1))` (the
    * fraction of a node's neighbor pairs that are themselves linked),
    * null for degree-1 nodes.
    *
    * Scale shape: two equi-joins on edge endpoints (the join input is
    * the ordered edge table, so each wedge is generated once, not
    * twice) and one node-keyed count — no neighborhood arrays, no
    * windows. Skew note: a hot MIDDLE node of degree D still generates
    * ~D^2/2 wedges — the orientation here is by node ID (canonical
    * enumeration only), NOT the degree-ordered orientation that
    * mitigates hubs at web scale; on a hub-heavy pair graph apply a
    * degree cap upstream (the Dedup family's df-cap pattern) or add
    * degree-ordering before relying on this at 10^10 edges.
    *
    * Output: (node, deg, n_triangles, clustering) ordered by caller. */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter($"a" =!= $"b")
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.select($"a".as("node"))
      .union(edges.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).cast("long").as("deg"))
    val tri = edges.select($"a", $"b")
      .join(edges.select($"a".as("b"), $"b".as("c")), Seq("b"))
      .join(edges.select($"a", $"b".as("c")), Seq("a", "c"))
      .select($"a", $"b", $"c")
    val perNode = tri.select(explode(array($"a", $"b", $"c")).as("node"))
      .groupBy($"node").agg(count(lit(1)).cast("long").as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select($"node", $"deg",
        coalesce($"n_triangles", lit(0L)).as("n_triangles"),
        when($"deg" >= 2, round(
          lit(2.0) * coalesce($"n_triangles", lit(0L)) /
            ($"deg" * ($"deg" - 1)).cast("double"), 6)).as("clustering"))
  }
}
