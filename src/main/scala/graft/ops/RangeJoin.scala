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
  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val lb = left.withColumn("_bkt", expr(s"$ts div ${bucketWidth}L"))
    val rb = right.withColumn("_bkt", explode(sequence(
      expr(s"$lo div ${bucketWidth}L"), expr(s"$hi div ${bucketWidth}L"))))
    lb.join(rb, keys :+ "_bkt")
      .filter(col(ts) >= col(lo) && col(ts) <= col(hi))
      .drop("_bkt")
  }
}
