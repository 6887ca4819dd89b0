package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-time (as-of) join: for each left row, the LATEST right row with
  * the same key and `right.ts <= left.ts` (backward as-of, inclusive).
  *
  * Implementation is the single-shuffle union + last-non-null-window
  * pattern: tag both inputs, union them, and carry right values forward
  * with `last(_, ignoreNulls)` over a (key, ts, side, rid) ordering —
  * right rows sort before left rows at equal ts, which is what makes the
  * join inclusive. One hash exchange on the keys plus a per-partition
  * sort; no per-key cross product, no range explosion — at 100 TB this is
  * the difference between a sort-merge pass and a quadratic candidate
  * join. (An extension operator isn't needed: the composition already
  * yields the plan a custom SparkPlan would produce.)
  *
  * Requirements: `left` must not already contain `valueCols`; neither input
  * may contain the reserved internal columns `_side`/`_ats`/`_rid`/`_vals`;
  * ties among right rows at the same (key, ts) are broken by `rightIdCol`
  * ascending (last — i.e. highest id — wins), so pass one whenever
  * (key, ts) is not unique on the right.
  *
  * All value columns are carried as ONE struct from the matched right row —
  * a right row whose latest-match has NULL in some value column still
  * supplies that NULL (whole-row semantics), rather than falling back to an
  * older row's value per-column.
  *
  * `maxStaleness` (in the ts columns' own units — normalize both sides
  * first, e.g. [[graft.Catalog.tsAsNanos]]) bounds the lookback: when the
  * matched right row is older than `left.ts − maxStaleness`, every value
  * column comes back NULL — the feature-store "max lookback" contract
  * (a stale feature is worse than a missing one). The bound nulls the
  * WHOLE match (any older row is staler still), and the plan is unchanged:
  * the matched ts rides the same carried struct, one extra comparison per
  * output row.
  */
object AsOfJoin {
  private val Reserved = Seq("_side", "_ats", "_rid", "_vals", "_mts")

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      rightIdCol: Option[String] = None,
      maxStaleness: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "asOf needs at least one right value column")
    // Both ts sides must be numeric: the matched RIGHT ts is carried into
    // _mts and compared against leftTs − tol, so a timestamp-typed right
    // side would hit an implicit cast (confusing error or wrong-unit
    // comparison) rather than this loud failure.
    require(maxStaleness.isEmpty ||
      (left.schema(leftTs).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType] &&
       right.schema(rightTs).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType]),
      "maxStaleness needs NUMERIC ts on BOTH sides (normalize first, e.g. tsAsNanos)")
    require(!valueCols.exists(left.columns.contains),
      s"left already contains ${valueCols.mkString(",")}")
    for (c <- Reserved) {
      require(!left.columns.contains(c), s"asOf: left must not contain reserved column $c")
      require(!right.columns.contains(c), s"asOf: right must not contain reserved column $c")
    }
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_ats", col(leftTs))
      .withColumn("_rid", lit(null).cast(LongType))
    val r = right
      .select(keys.map(col) ++ Seq(col(rightTs).as("_ats")) ++
        valueCols.map(col): _*)
      .withColumn("_side", lit(0))
      .withColumn("_rid",
        rightIdCol.map(c => col(c).cast(LongType)).getOrElse(lit(0L)))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc, col("_rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Whole-row carry: pack the right row's values into one struct (NULL for
    // left rows — a bare struct(nulls) would be non-null and defeat
    // ignoreNulls), take the last non-null struct, then unpack.
    val filled = u
      .withColumn("_vals",
        when(col("_side") === 0,
          struct(col("_ats").as("_mts") +: valueCols.map(col): _*)))
      .withColumn("_vals", last(col("_vals"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val fresh = maxStaleness match {
      case Some(tol) =>
        (c: String) => when(
          col("_vals").getField("_mts") >= col(leftTs) - lit(tol),
          col("_vals").getField(c)).as(c)
      case None => (c: String) => col("_vals").getField(c).as(c)
    }
    filled.select(left.columns.toIndexedSeq.map(col) ++
      valueCols.map(fresh): _*)
  }
}
