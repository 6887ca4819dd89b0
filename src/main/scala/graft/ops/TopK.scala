package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}
import graft.plans.{TopKPerKey, TopKPerKeyStrategy}

/** DataFrame API for the custom per-key top-k operator
  * ([[graft.plans.TopKPerKey]]). Registers its planner strategy on first
  * use (idempotent). */
object TopK {
  /** The k highest (or lowest) rows per key group, by `order`. Output order
    * within groups is unspecified (sort after if needed).
    *
    * Semantics notes:
    *  - rows whose `order` evaluates to NULL are dropped (unlike the
    *    row_number() formulation, where nulls sort last and can fill out k);
    *  - ties at the k boundary keep an arbitrary row among the tied ones —
    *    pass a struct order (e.g. `struct(score, id)`) when the selected
    *    ROWS (not just the order-value multiset) must be deterministic. */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Column, k: Int,
      descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    // Materialize the order expression as a column and let the analyzer
    // resolve it — then the logical node only ever references attributes.
    val withOrd = df.withColumn("__topk_ord", order)
    val plan = withOrd.queryExecution.analyzed
    val keyExprs = keyCols.map(n =>
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n")))
    val ordExpr = plan.output.find(_.name == "__topk_ord").get
    DatasetBridge.ofRows(spark,
      TopKPerKey(k, keyExprs, ordExpr, descending, plan))
      .drop("__topk_ord")
  }
}
