package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling for training-data pipelines.
  *
  * Both operators order/select by a uniform content hash instead of a RNG:
  * the sample is a pure function of the data, so reruns, retries, and
  * different partitionings all produce the SAME sample (and the DuckDB
  * oracle can reproduce it exactly). The hash should be the portable md5-60
  * ([[graft.text.Dedup.portableHash]]) when cross-engine parity matters.
  *
  * Scale: [[byHash]] is a pure filter (narrow, pushable); [[stratified]]
  * rides the bounded-heap [[TopK.perKey]] operator — ≤ k rows per
  * (stratum, partition) move in the shuffle, so "k docs per language over
  * 100 TB" never materializes a stratum.
  */
object Sampling {

  /** Keep ~`permille`/1000 of rows: hash-threshold (Bernoulli-by-content)
    * sampling. */
  def byHash(df: DataFrame, hash: Column, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000)
    df.filter(pmod(hash, lit(1000L)) < permille)
  }

  /** Exactly `k` rows per stratum (fewer if the stratum is smaller),
    * chosen as the k SMALLEST hash values — a uniform, deterministic
    * per-group sample. Ties must not exist in the hash for the selected
    * set to be unique; pass a collision-free id-bearing struct otherwise. */
  def stratified(df: DataFrame, strataCols: Seq[String], hash: Column,
      k: Int): DataFrame = {
    require(!df.columns.contains("__h"),
      "stratified: input must not contain reserved column __h")
    TopK.perKey(df.withColumn("__h", hash), strataCols, col("__h"), k,
      descending = false).drop("__h")
  }
}
