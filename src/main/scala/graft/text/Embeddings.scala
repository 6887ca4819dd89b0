package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column storage transforms for training-data pipelines.
  *
  * Everything is pure column expressions (codegen'd HOFs over the array
  * column — no UDFs), so at 100 TB these run as one narrow map stage over
  * the scan and the DuckDB oracle reproduces each element bit-exactly
  * (IEEE double arithmetic; `round` is half-away-from-zero in both
  * engines).
  */
object Embeddings {

  /** int8 max-abs quantization: per vector, `scale = 127 / max|x|` and
    * `q_i = round(x_i * scale)` (saturating the int8 range by
    * construction), plus the quantized array's sum and the max
    * reconstruction error `|x_i − q_i/scale|` (≤ half a quantization step)
    * for in-plan quality monitoring. Zero vectors are dropped — they have
    * no max-abs scale (store them as all-zero out of band).
    *
    * Output columns: input's ++ (max_abs, scale, q int8[], q_sum, max_err) —
    * these five names are RESERVED: an input frame that already carries any
    * of them is rejected (the unqualified internal references would
    * otherwise be ambiguous or silently shadow the caller's data).
    * ~4× storage reduction for float32 embeddings at a bounded, monitored
    * precision cost — the standard trade for ANN candidate stores. */
  def quantizeInt8(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    val reserved = Seq("max_abs", "scale", "q", "q_sum", "max_err")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"quantizeInt8: input must not contain reserved output column(s) " +
        clash.mkString(", "))
    df.withColumn("max_abs", expr(
      s"array_max(transform($embCol, x -> abs(cast(x as double))))"))
      .filter(col("max_abs") > 0)
      .withColumn("scale", lit(127.0) / col("max_abs"))
      .withColumn("q", expr(
        s"transform($embCol, x -> cast(round(cast(x as double) * scale) as tinyint))"))
      .withColumn("q_sum", expr(
        "aggregate(q, cast(0 as bigint), (acc, v) -> acc + cast(v as bigint))"))
      .withColumn("max_err", expr(
        s"""array_max(transform($embCol,
            x -> abs(cast(x as double)
                     - round(cast(x as double) * scale) / scale)))"""))
  }

  /** Dequantize back to doubles: `x̂_i = q_i / scale`. */
  def dequantize(df: DataFrame, qCol: String = "q",
      scaleCol: String = "scale", outCol: String = "emb_hat"): DataFrame =
    df.withColumn(outCol, expr(
      s"transform($qCol, v -> cast(v as double) / $scaleCol)"))
}
