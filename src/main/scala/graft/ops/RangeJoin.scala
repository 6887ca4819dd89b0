package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left POINT rows against right INTERVAL rows on
  * equal keys with `lo <= ts <= hi` (inclusive).
  *
  * A naive theta-join (key equality + two inequalities) degenerates to a
  * per-key cross product — quadratic within hot keys. This operator
  * bucketizes time instead: each right interval explodes into the coarse
  * buckets it covers (≈ len/bucketWidth + 1 rows), each left point lands in
  * exactly ONE bucket, and the join becomes an equi-join on
  * (keys…, bucket) followed by the exact range filter. Because a point has
  * one bucket, a (point, interval) pair can meet at most once — no
  * post-join dedup. Work scales with true matches plus the bucket
  * replication factor, never n².
  *
  * `bucketWidth` should be on the order of typical interval length (one
  * bucket-row per interval, few false candidates). Bucket ids are computed
  * with integer `div` — timestamps in nanos exceed double's 2^53 mantissa,
  * so floating floor() would corrupt them.
  */
object RangeJoin {
  /** Backtick-quoted identifier for interpolation into expr() — column names
    * with dots/spaces/hyphens resolve as single identifiers, matching the
    * Column-API style used elsewhere. */
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    require(!left.columns.contains("_bkt") && !right.columns.contains("_bkt"),
      "pointInInterval: inputs must not contain reserved column _bkt")
    val lb = left.withColumn("_bkt", expr(s"${q(ts)} div ${bucketWidth}L"))
    val rb = right.withColumn("_bkt", explode(sequence(
      expr(s"${q(lo)} div ${bucketWidth}L"), expr(s"${q(hi)} div ${bucketWidth}L"))))
    lb.join(rb, keys :+ "_bkt")
      // expr(quoted) rather than col(): col("a.ts") would parse the dot as
      // a struct-field access
      .filter(expr(q(ts)) >= expr(q(lo)) && expr(q(ts)) <= expr(q(hi)))
      .drop("_bkt")
  }
}
