package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the table-statistics primitive every warehouse
  * exposes (null counts, cardinalities, value ranges), expressed as one
  * aggregate per column unioned into a single lazy plan.
  *
  * Per-column aggregates (rather than one wide agg with N count-distincts)
  * are deliberate: each branch's parquet scan prunes to exactly its one
  * column (`ReadSchema` shows a single field per branch), and Catalyst
  * runs the branches as independent stages — no count-distinct `Expand`
  * blowup over the full row width. At 100 TB the exact distinct count is
  * the expensive part; swap `countDistinct` for `approx_count_distinct`
  * (or the KMV sketch in [[graft.functions.KmvSketch]]) when an estimate
  * suffices — the declared query keeps the exact form because the oracle
  * checks exact values.
  */
object Profile {

  /** One row per profiled column: `n_null`, `n_distinct` (exact, nulls
    * excluded), numeric range (`min_num`/`max_num` — doubles, timestamps
    * as epoch micros, null for strings) and lexical range
    * (`min_str`/`max_str` — strings only). */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val fields =
      if (cols.isEmpty) df.schema.fields.toSeq
      else df.schema.fields.filter(f => cols.contains(f.name)).toSeq
    require(fields.nonEmpty, "no columns to profile")
    val parts = fields.map { f =>
      val c = col(f.name)
      val numExpr: Column = f.dataType match {
        case _: NumericType => c.cast(DoubleType)
        // parquet timestamps arrive as NTZ under Spark 4's inferTimestampNTZ;
        // NTZ→TZ cast is value-preserving in the UTC session this library pins
        case TimestampType | TimestampNTZType =>
          unix_micros(c.cast(TimestampType)).cast(DoubleType)
        case DateType       => datediff(c, lit("1970-01-01")).cast(DoubleType)
        case _              => lit(null).cast(DoubleType)
      }
      val strExpr: Column = f.dataType match {
        case StringType => c
        case _          => lit(null).cast(StringType)
      }
      df.agg(
        count(lit(1)).as("n_rows"),
        count(c).as("n_nonnull"),
        countDistinct(c).as("n_distinct"),
        min(numExpr).as("min_num"), max(numExpr).as("max_num"),
        min(strExpr).as("min_str"), max(strExpr).as("max_str"))
        .select(lit(f.name).as("col_name"),
          (col("n_rows") - col("n_nonnull")).as("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    parts.reduce(_.unionByName(_))
  }

  /** Gini coefficient of a mass column across groups — the INEQUALITY
    * read on a mixture ("how concentrated is the token budget across
    * sources?"): 0 = perfectly even, →1 = one group holds everything;
    * the number a mixing schedule ([[Sampling.byTemperature]],
    * tokenBudgetMix) is trying to move. Sample Gini over ascending-sorted
    * group masses x₁≤…≤x_n: G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) — an
    * EXACT integer numerator/denominator (rank ties broken by group key,
    * but G is invariant to within-tie order: tied x share the value, so
    * Σ i·xᵢ over a tie block is order-free) plus one IEEE division.
    *
    * Output (1 row): n_groups, total_mass, gini_num, gini_den, gini
    * (NULL when total mass is 0).
    *
    * Scale: one group-keyed sum with map-side partials, then a rank
    * window over the GROUP table (|groups| rows — sources, languages,
    * shards — bounded), one 1-row finish. */
  def gini(df: DataFrame, group: Column, mass: Column): DataFrame = {
    val g = df.groupBy(group.as("_k"))
      .agg(sum(mass.cast(LongType)).as("_x"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_x"), col("_k"))
    g.withColumn("_i", row_number().over(w).cast(LongType))
      .agg(count(lit(1)).as("n_groups"), sum("_x").as("total_mass"),
        sum(col("_i") * col("_x")).as("_ix"))
      .select(col("n_groups"), col("total_mass"),
        (lit(2L) * col("_ix") - (col("n_groups") + 1L) * col("total_mass"))
          .as("gini_num"),
        (col("n_groups") * col("total_mass")).as("gini_den"))
      .withColumn("gini",
        when(col("total_mass") > 0,
          col("gini_num").cast(DoubleType) / col("gini_den").cast(DoubleType)))
  }
}
