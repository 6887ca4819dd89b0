package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB path.
  *
  * A shuffle join on a skewed key sends the hot key's entire volume to one
  * reducer. AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.*`, on
  * by default) handles sort-merge joins at runtime; explicit salting is the
  * deterministic fallback when the small side can be replicated — e.g.
  * aggregations keyed by a hot tenant, or map-side-unsplittable patterns.
  */
object Salting {

  /** Salted equi-join of a skewed `fact` against a replicable `dim`:
    * the fact side gets a per-row salt in [0, buckets); the dim side is
    * exploded `buckets`× so every (key, salt) pair finds its partner. The
    * shuffle key becomes (key, salt) — the hot key now spreads over
    * `buckets` reducers at the cost of a `buckets`× dim replication. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // right/full joins would emit each unmatched dim row `buckets` times
    // (once per exploded salt) — only fact-preserving join types are sound
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")(joinType.toLowerCase),
      s"saltedJoin preserves only fact-side join types, got: $joinType")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets))
        .cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Join/aggregation-key SKEW DIAGNOSIS — the measurement you run
    * BEFORE choosing a mitigation (AQE skew-join, [[saltedJoin]],
    * broadcast): the top `k` heaviest keys with their exact row counts,
    * each key's share of all rows (ONE division of exact integers —
    * bit-stable cross-engine, the op_corr_stats discipline), and the
    * total distinct-key count carried on every row for context.
    *
    * Scale: one key-count aggregate with map-side partials (the shuffle
    * moves distinct keys, not rows), a 1-row totals aggregate, and the
    * global top-k via orderBy+limit — TakeOrderedAndProject's bounded
    * per-partition heaps, never a full sort of the key spectrum. */
  def skewStats(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = df.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("key_rows"))
    val tot = counts.agg(sum("key_rows").as("_tot"),
      count(lit(1)).as("n_keys"))
    counts
      .orderBy(col("key_rows").desc, col("key"))
      .limit(k)
      .crossJoin(broadcast(tot))
      .select(col("key"), col("key_rows"),
        (col("key_rows").cast("double") / col("_tot").cast("double"))
          .as("share"),
        col("n_keys"))
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. `partials` maps each source column to a
    * re-aggregatable (partialAgg, finalAgg) pair — e.g. sum/sum,
    * count/sum. Catalyst already does map-side partials for hash
    * aggregates; this adds an extra reduce level for keys so hot that even
    * a single reducer's final merge is the bottleneck. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    df.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }
}
