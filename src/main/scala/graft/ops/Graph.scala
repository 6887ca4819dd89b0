package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-native graph analytics over edge lists — the relational
  * formulation (joins + aggregates) that scales with Spark's shuffle
  * machinery instead of requiring a graph runtime. Connected components
  * live in [[graft.text.Dedup.dedupClusters]]; this object holds the
  * co-occurrence graph builder and triangle counting.
  */
object Graph {

  /** Undirected distinct edges from co-occurrence: two items are
    * connected iff they appear under the same group key (parts in one
    * order, tokens in one doc, ...). Edges are canonical `x < y` rows.
    *
    * Scale: one equi-join keyed on the group — per-group work is
    * C(group size, 2), so edge volume is bounded by the group-size
    * distribution, not the corpus (cap group size upstream for hub
    * groups, as the dedup family does with maxDf). */
  def cooccurrenceEdges(df: DataFrame, group: Column, item: Column): DataFrame = {
    val l = df.select(group.as("g"), item.as("x")).distinct()
    val r = l.select(col("g"), col("x").as("y"))
    l.join(r, "g").filter(col("x") < col("y"))
      .select("x", "y").distinct()
  }

  /** Triangle count by the ordered-edge wedge join: edges are canonical
    * `x < y`, wedges chain `x < m < z`, and each triangle is counted
    * exactly once when the closing edge `(x, z)` exists. Two shuffles
    * (wedge build keyed on the middle vertex, close keyed on (x, z)) —
    * the standard distributed formulation. Production note: ordering
    * vertices by DEGREE instead of id provably minimizes the wedge
    * volume on skewed graphs; id order is the deterministic variant the
    * cross-engine oracle mirrors. Returns one row: (n_edges,
    * n_triangles). */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select("x", "y")
    val wedges = e.select(col("x"), col("y").as("m"))
      .join(e.select(col("x").as("m"), col("y").as("z")), "m")
      .select("x", "z")
    val tri = wedges.join(e.select(col("x"), col("y").as("z")), Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
    e.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
  }

  /** PageRank over canonical `x < y` undirected edges, in FIXED-POINT
    * integer arithmetic so every iteration is deterministic and
    * cross-engine reproducible: ranks are longs scaled by `Scale` (1e12),
    * each vertex sends `rank div outdeg` along its out-edges, and the
    * update is `base + (85 * inSum) div 100` with
    * `base = (15% of Scale) div n` — floor division throughout, so integer
    * sums (order-independent) are the only aggregation and no
    * order-dependent float accumulation exists anywhere. The graph is
    * symmetrized (both directions of every edge), which also removes
    * dangling vertices by construction; isolated vertices (no edges) are
    * out of scope of the edge list and excluded.
    *
    * Scale: per iteration = one join of the rank frame against the
    * degree-annotated adjacency (shuffle keyed on source) + one aggregate
    * keyed on destination — the standard distributed formulation with
    * map-side partial sums. Iterations are a fixed small constant; at
    * production scale persist/checkpoint the rank frame per iteration to
    * cut lineage (here the whole computation stays ONE lazy plan, which
    * AQE replans per stage). The vertex count lands as a literal via one
    * bounded aggregate action (a single long), mirroring how a real
    * driver program owns the iteration loop.
    *
    * Returns the `topK` vertices by (rank desc, vertex asc) as
    * `(v, rank_fp)` — TakeOrderedAndProject, never a global sort. */
  def pageRank(edges: DataFrame, iterations: Int = 2, topK: Int = 20): DataFrame = {
    require(iterations >= 1 && iterations <= 10, "iterations must be in [1, 10]")
    val Scale = 1000000000000L
    val sym = edges.select(col("x").as("s"), col("y").as("d"))
      .unionByName(edges.select(col("y").as("s"), col("x").as("d")))
    val deg = sym.groupBy("s").agg(count(lit(1)).as("dg"))
    val adj = sym.join(deg, "s")
    val n = deg.count() // one bounded action: the vertex count scalar
    require(n > 0, "pageRank needs a non-empty edge list")
    val base = (Scale * 15L / 100L) / n
    var ranks = deg.select(col("s").as("v"), lit(Scale / n).as("r"))
    for (_ <- 1 to iterations) {
      ranks = adj.join(ranks, col("s") === col("v"))
        .select(col("d"), expr("r div dg").as("c"))
        .groupBy("d").agg(sum("c").as("cs"))
        .select(col("d").as("v"), (lit(base) + expr("(85 * cs) div 100")).as("r"))
    }
    ranks.orderBy(desc("r"), asc("v")).limit(topK)
      .select(col("v"), col("r").as("rank_fp"))
  }
}
