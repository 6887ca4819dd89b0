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
}
